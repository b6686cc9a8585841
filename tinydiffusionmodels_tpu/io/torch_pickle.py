"""Dependency-free reader/writer for PyTorch ``.pth`` checkpoints.

BASELINE.json requires the rebuild to round-trip the reference's torch-pickle
checkpoints (reference saves bare state_dicts — src/mnist.py:165 — and nested
multi-model dicts — src/shakespeare.py:330-341) *without* making the JAX
framework depend on torch.

Format (torch >= 1.6 zipfile serialization):
  {name}/data.pkl    pickle (protocol 2) of the object graph; tensors are
                     ``torch._utils._rebuild_tensor_v2(storage, offset,
                     size, stride, requires_grad, OrderedDict())`` calls whose
                     storage is a persistent id
                     ('storage', torch.<T>Storage, key, 'cpu', numel)
  {name}/data/{key}  raw little-endian storage bytes
  {name}/version     serialization version ('3')
  {name}/byteorder   'little'

Reading: a custom Unpickler maps the torch globals to local stubs and
materializes tensors as numpy arrays (bfloat16 via ml_dtypes, which JAX
ships). Writing: stub callables carrying torch's module/qualname pickle as
the right GLOBAL opcodes, so real torch loads our files unmodified
(verified against torch in tests/test_torch_pickle.py).
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict
from typing import Any

import numpy as np

try:  # bfloat16 numpy support; bundled with jax.
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = None

# torch storage class name <-> numpy dtype.
_STORAGE_TO_DTYPE = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("bool"),
}
if _BFLOAT16 is not None:
    _STORAGE_TO_DTYPE["BFloat16Storage"] = _BFLOAT16

_DTYPE_TO_STORAGE = {v: k for k, v in _STORAGE_TO_DTYPE.items()}
# numpy has no native bf16; also map the common upcast aliases.
_DTYPE_TO_STORAGE[np.dtype("<f4")] = "FloatStorage"


# ---------------------------------------------------------------------------
# Reading
# ---------------------------------------------------------------------------

class _LazyStorage:
    """Placeholder produced by persistent_load; holds raw bytes + dtype."""

    __slots__ = ("data", "dtype", "numel")

    def __init__(self, data: bytes, dtype: np.dtype, numel: int):
        self.data = data
        self.dtype = dtype
        self.numel = numel


def _rebuild_tensor_v2(
    storage: _LazyStorage,
    storage_offset: int,
    size: tuple[int, ...],
    stride: tuple[int, ...],
    requires_grad: bool = False,
    backward_hooks: Any = None,
    metadata: Any = None,
) -> np.ndarray:
    flat = np.frombuffer(storage.data, dtype=storage.dtype)
    if not size:
        return flat[storage_offset].copy().reshape(())
    itemsize = storage.dtype.itemsize
    strided = np.lib.stride_tricks.as_strided(
        flat[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
        writeable=False,
    )
    return np.ascontiguousarray(strided)


def _rebuild_parameter(data: np.ndarray, requires_grad: bool = True,
                       backward_hooks: Any = None) -> np.ndarray:
    return data


class _StorageTypeTag:
    """Stands in for torch.FloatStorage etc. during unpickling."""

    def __init__(self, name: str):
        self.name = name


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, storages: dict[str, bytes]):
        super().__init__(file, encoding="utf-8")
        self._storages = storages

    def find_class(self, module: str, name: str):
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "torch" and name in _STORAGE_TO_DTYPE:
            return _StorageTypeTag(name)
        if module == "collections" and name == "OrderedDict":
            return OrderedDict
        if module == "torch" and name == "Size":
            return tuple
        raise pickle.UnpicklingError(
            f"torch_pickle: refusing to load global {module}.{name} "
            "(only plain tensors/containers are supported)"
        )

    def persistent_load(self, pid):
        kind, storage_type, key, location, numel = pid
        if kind != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id kind: {kind!r}")
        if isinstance(storage_type, _StorageTypeTag):
            dtype = _STORAGE_TO_DTYPE[storage_type.name]
        else:  # pragma: no cover - defensive
            raise pickle.UnpicklingError(f"unknown storage type: {storage_type!r}")
        return _LazyStorage(self._storages[str(key)], dtype, int(numel))


def torch_load(path_or_file) -> Any:
    """Load a torch-format .pth file into numpy-leafed Python containers."""
    with zipfile.ZipFile(path_or_file, "r") as zf:
        names = zf.namelist()
        pkl_names = [n for n in names if n.endswith("/data.pkl")]
        if not pkl_names:
            raise ValueError(
                "not a torch zipfile checkpoint (no data.pkl); legacy "
                "pre-1.6 torch files are not supported"
            )
        archive = pkl_names[0][: -len("/data.pkl")]
        storages = {
            n[len(archive) + len("/data/"):]: zf.read(n)
            for n in names
            if n.startswith(f"{archive}/data/") and not n.endswith("/")
        }
        byteorder_name = f"{archive}/byteorder"
        if byteorder_name in names and zf.read(byteorder_name) not in (
            b"little",
            b"little\n",
        ):
            raise ValueError("big-endian checkpoints are not supported")
        data = zf.read(pkl_names[0])
    return _TorchUnpickler(io.BytesIO(data), storages).load()


# ---------------------------------------------------------------------------
# Writing
# ---------------------------------------------------------------------------

def _stub(module: str, qualname: str):
    """A callable that pickles as GLOBAL '{module} {qualname}'."""

    def fn(*args, **kwargs):  # pragma: no cover - never called
        raise RuntimeError("write-side stub")

    fn.__module__ = module
    fn.__qualname__ = qualname
    fn.__name__ = qualname
    return fn


def _storage_class_stub(name: str):
    """A class that pickles as GLOBAL 'torch {name}' in the persistent id."""
    cls = type(name, (), {"__module__": "torch", "__qualname__": name})
    return cls


_REBUILD_TENSOR_STUB = _stub("torch._utils", "_rebuild_tensor_v2")


class _TensorProxy:
    """Wraps a numpy array; __reduce__ emits the torch rebuild call."""

    def __init__(self, arr: np.ndarray, key: int):
        self.arr = arr
        self.key = key

    def __reduce__(self):
        arr = self.arr
        size = tuple(int(s) for s in arr.shape)
        # Contiguous row-major strides in element units (we always write
        # contiguous data).
        stride = []
        acc = 1
        for s in reversed(size):
            stride.append(acc)
            acc *= s
        stride = tuple(reversed(stride))
        return (
            _REBUILD_TENSOR_STUB,
            (
                _StoragePersistentProxy(self.key, arr),
                0,
                size,
                stride,
                False,
                OrderedDict(),
            ),
        )


class _StoragePersistentProxy:
    """Marker the Pickler turns into a BINPERSID via persistent_id."""

    def __init__(self, key: int, arr: np.ndarray):
        self.key = key
        self.arr = arr


class _TorchPickler(pickle._Pickler):
    """Pure-Python pickler so save_global can emit torch GLOBAL opcodes
    without resolving them against an installed torch (the C pickler
    verifies that module.qualname is the same object being saved)."""

    dispatch = pickle._Pickler.dispatch.copy()

    def save_global(self, obj, name=None):
        mod = getattr(obj, "__module__", None)
        qual = getattr(obj, "__qualname__", None)
        if mod in ("torch._utils", "torch") and qual:
            self.write(pickle.GLOBAL + f"{mod}\n{qual}\n".encode("utf-8"))
            self.memoize(obj)
            return
        pickle._Pickler.save_global(self, obj, name)

    # The dispatch table binds functions at class-definition time, so the
    # override must be re-registered for functions and classes.
    dispatch[type(save_global)] = save_global
    dispatch[type] = save_global

    def persistent_id(self, obj):
        if isinstance(obj, _StoragePersistentProxy):
            dtype = obj.arr.dtype
            storage_name = _DTYPE_TO_STORAGE.get(dtype)
            if storage_name is None:
                raise TypeError(f"unsupported tensor dtype for .pth: {dtype}")
            return (
                "storage",
                _storage_class_stub(storage_name),
                str(obj.key),
                "cpu",
                int(obj.arr.size),
            )
        return None


def _wrap_tensors(obj: Any, sink: list[np.ndarray]) -> Any:
    """Replace array leaves with _TensorProxy, collecting storages in order."""
    if isinstance(obj, np.ndarray):
        arr = np.ascontiguousarray(obj)
        key = len(sink)
        sink.append(arr)
        return _TensorProxy(arr, key)
    if isinstance(obj, np.generic):
        return _wrap_tensors(np.asarray(obj), sink)
    if isinstance(obj, OrderedDict):
        return OrderedDict((k, _wrap_tensors(v, sink)) for k, v in obj.items())
    if isinstance(obj, dict):
        return {k: _wrap_tensors(v, sink) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        mapped = [_wrap_tensors(v, sink) for v in obj]
        return type(obj)(mapped) if isinstance(obj, list) else tuple(mapped)
    return obj


def torch_save(obj: Any, path_or_file, archive_name: str = "archive") -> None:
    """Write ``obj`` (containers of numpy arrays / scalars) as a torch .pth.

    Arrays become torch tensors on the other side; jax.Array leaves should be
    converted by the caller (io/checkpoint.py does this and the name/layout
    mapping).
    """
    storages: list[np.ndarray] = []
    wrapped = _wrap_tensors(obj, storages)

    buf = io.BytesIO()
    pickler = _TorchPickler(buf, protocol=2)
    pickler.dump(wrapped)

    with zipfile.ZipFile(path_or_file, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{archive_name}/data.pkl", buf.getvalue())
        for key, arr in enumerate(storages):
            zf.writestr(f"{archive_name}/data/{key}", arr.tobytes())
        zf.writestr(f"{archive_name}/version", "3\n")
        zf.writestr(f"{archive_name}/byteorder", "little")
