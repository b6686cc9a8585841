"""Round-trip tests for the dependency-free .pth codec against real torch.

This is the riskiest compatibility surface (SURVEY.md §7 "Hard parts"):
- our reader must load files torch wrote,
- torch must load files our writer wrote,
- both directions must preserve values, dtypes, shapes, and nesting.
"""

import io
from collections import OrderedDict

import numpy as np
import pytest

from tinydiffusionmodels_tpu.io.torch_pickle import torch_load, torch_save

torch = pytest.importorskip("torch")


def _roundtrip_via_ours(obj):
    buf = io.BytesIO()
    torch.save(obj, buf)
    buf.seek(0)
    return torch_load(buf)


def _roundtrip_via_torch(obj):
    buf = io.BytesIO()
    torch_save(obj, buf)
    buf.seek(0)
    return torch.load(buf, map_location="cpu", weights_only=True)


class TestReadTorchFiles:
    def test_bare_state_dict(self):
        """MNIST checkpoint shape: bare state_dict (reference src/mnist.py:165)."""
        sd = OrderedDict(
            [
                ("conv1.weight", torch.randn(32, 1, 3, 3)),
                ("conv1.bias", torch.randn(32)),
            ]
        )
        out = _roundtrip_via_ours(sd)
        assert isinstance(out, OrderedDict)
        np.testing.assert_array_equal(
            out["conv1.weight"], sd["conv1.weight"].numpy()
        )
        assert out["conv1.weight"].dtype == np.float32

    def test_nested_multi_model_dict(self):
        """Shakespeare checkpoint shape (reference src/shakespeare.py:330-341)."""
        ckpt = {
            "diffusion_model": OrderedDict([("w", torch.randn(4, 4))]),
            "rounding_fn": OrderedDict([("decoder.weight", torch.randn(10, 4))]),
            "epoch": 7,
            "val_loss": 0.123,
            "final_training": True,
        }
        out = _roundtrip_via_ours(ckpt)
        assert out["epoch"] == 7
        assert out["val_loss"] == pytest.approx(0.123)
        assert out["final_training"] is True
        np.testing.assert_array_equal(
            out["rounding_fn"]["decoder.weight"],
            ckpt["rounding_fn"]["decoder.weight"].numpy(),
        )

    def test_dtypes(self):
        obj = {
            "f32": torch.randn(3),
            "f64": torch.randn(3, dtype=torch.float64),
            "f16": torch.randn(3).half(),
            "bf16": torch.randn(3).bfloat16(),
            "i64": torch.arange(3),
            "i32": torch.arange(3, dtype=torch.int32),
            "u8": torch.arange(3, dtype=torch.uint8),
            "bool": torch.tensor([True, False]),
        }
        out = _roundtrip_via_ours(obj)
        assert out["f32"].dtype == np.float32
        assert out["f64"].dtype == np.float64
        assert out["f16"].dtype == np.float16
        assert str(out["bf16"].dtype) == "bfloat16"
        assert out["i64"].dtype == np.int64
        np.testing.assert_array_equal(out["i64"], [0, 1, 2])
        np.testing.assert_array_equal(out["bool"], [True, False])
        np.testing.assert_array_equal(
            out["bf16"].astype(np.float32),
            obj["bf16"].float().numpy(),
        )

    def test_noncontiguous_tensor(self):
        """torch may save views with nontrivial strides."""
        base = torch.randn(6, 8)
        view = base.t()  # transposed, non-contiguous
        out = _roundtrip_via_ours({"v": view})
        np.testing.assert_array_equal(out["v"], view.numpy())

    def test_scalar_tensor(self):
        out = _roundtrip_via_ours({"s": torch.tensor(3.5)})
        assert out["s"].shape == ()
        assert float(out["s"]) == 3.5

    def test_rejects_arbitrary_globals(self):
        import pickle as pkl

        class Evil:
            pass

        buf = io.BytesIO()
        # Plain (non-zip) pickles are rejected up front...
        with pytest.raises(Exception):
            torch_load(io.BytesIO(pkl.dumps(Evil())))


class TestTorchReadsOurFiles:
    def test_state_dict(self):
        sd = {
            "layer.weight": np.random.default_rng(0)
            .standard_normal((8, 4))
            .astype(np.float32),
            "layer.bias": np.zeros(8, dtype=np.float32),
        }
        out = _roundtrip_via_torch(sd)
        assert isinstance(out["layer.weight"], torch.Tensor)
        np.testing.assert_array_equal(out["layer.weight"].numpy(), sd["layer.weight"])
        assert out["layer.weight"].dtype == torch.float32

    def test_nested_and_scalars(self):
        ckpt = {
            "diffusion_model": {"w": np.ones((2, 2), np.float32)},
            "epoch": 3,
            "val_loss": 0.5,
            "final_training": True,
            "name": "best",
        }
        out = _roundtrip_via_torch(ckpt)
        assert out["epoch"] == 3
        assert out["name"] == "best"
        np.testing.assert_array_equal(
            out["diffusion_model"]["w"].numpy(), np.ones((2, 2))
        )

    def test_dtypes_to_torch(self):
        obj = {
            "f32": np.random.randn(3).astype(np.float32),
            "i64": np.arange(3, dtype=np.int64),
            "u8": np.arange(3, dtype=np.uint8),
            "bool": np.array([True, False]),
        }
        out = _roundtrip_via_torch(obj)
        assert out["f32"].dtype == torch.float32
        assert out["i64"].dtype == torch.int64
        assert out["u8"].dtype == torch.uint8
        assert out["bool"].dtype == torch.bool

    def test_full_cycle_ours_torch_ours(self):
        sd = {"w": np.random.default_rng(1).standard_normal((5, 5)).astype(np.float32)}
        via_torch = _roundtrip_via_torch(sd)
        buf = io.BytesIO()
        torch.save(via_torch, buf)
        buf.seek(0)
        back = torch_load(buf)
        np.testing.assert_array_equal(back["w"], sd["w"])


class TestRandomizedRoundtrip:
    """Randomized nested structures through both directions of the codec."""

    def _random_tree(self, rng, depth=0):
        kind = rng.integers(0, 6 if depth < 3 else 4)
        if kind == 0:
            shape = tuple(rng.integers(1, 5, size=rng.integers(1, 4)))
            dt = rng.choice(["f4", "f8", "i8", "i4", "u1"])
            return (rng.standard_normal(shape) * 10).astype(dt)
        if kind == 1:
            return int(rng.integers(-1000, 1000))
        if kind == 2:
            return float(rng.standard_normal())
        if kind == 3:
            return rng.choice(["alpha", "beta", "gamma"]).item()
        if kind == 4:
            return {
                f"k{i}": self._random_tree(rng, depth + 1)
                for i in range(rng.integers(1, 4))
            }
        return [self._random_tree(rng, depth + 1)
                for _ in range(rng.integers(1, 4))]

    def _assert_equal(self, a, b):
        if isinstance(a, np.ndarray):
            np.testing.assert_array_equal(a, np.asarray(b))
        elif isinstance(a, dict):
            assert set(a) == set(b)
            for k in a:
                self._assert_equal(a[k], b[k])
        elif isinstance(a, (list, tuple)):
            assert len(a) == len(b)
            for x, y in zip(a, b):
                self._assert_equal(x, y)
        else:
            assert a == b

    @pytest.mark.parametrize("seed", range(5))
    def test_torch_reads_random_trees(self, seed):
        rng = np.random.default_rng(seed)
        tree = {"root": self._random_tree(rng)}
        out = _roundtrip_via_torch(tree)

        def to_np(x):
            return x.numpy() if isinstance(x, torch.Tensor) else x

        def walk(x):
            if isinstance(x, dict):
                return {k: walk(v) for k, v in x.items()}
            if isinstance(x, (list, tuple)):
                return [walk(v) for v in x]
            return to_np(x)

        self._assert_equal(tree, walk(out))

    @pytest.mark.parametrize("seed", range(5))
    def test_we_read_torch_random_trees(self, seed):
        rng = np.random.default_rng(seed + 100)
        tree = {"root": self._random_tree(rng)}

        def to_torch(x):
            if isinstance(x, np.ndarray):
                return torch.from_numpy(x.copy())
            if isinstance(x, dict):
                return {k: to_torch(v) for k, v in x.items()}
            if isinstance(x, list):
                return [to_torch(v) for v in x]
            return x

        out = _roundtrip_via_ours(to_torch(tree))
        self._assert_equal(tree, out)


class TestPureRoundtrip:
    def test_ours_to_ours(self):
        obj = {"a": np.arange(6, dtype=np.float32).reshape(2, 3), "n": 1}
        buf = io.BytesIO()
        torch_save(obj, buf)
        buf.seek(0)
        out = torch_load(buf)
        np.testing.assert_array_equal(out["a"], obj["a"])
        assert out["n"] == 1
