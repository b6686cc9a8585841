"""Storage, checkpoint, and artifact I/O.

Parity surface with reference src/utils.py (is_gcs_path, parse_gcs_path,
download/upload, load/save checkpoint, save_samples, Vertex path
conventions) plus the pieces the TPU rebuild needs that the reference gets
from torch/torchvision: a dependency-free PyTorch .pth codec and a PNG grid
writer.
"""

from tinydiffusionmodels_tpu.io.storage import (
    is_gcs_path,
    parse_gcs_path,
    download_from_gcs,
    upload_to_gcs,
    load_checkpoint,
    save_checkpoint,
    save_samples,
    get_vertex_checkpoint_path,
    get_samples_dir,
)
from tinydiffusionmodels_tpu.io.torch_pickle import (
    torch_load,
    torch_save,
)

__all__ = [
    "is_gcs_path",
    "parse_gcs_path",
    "download_from_gcs",
    "upload_to_gcs",
    "load_checkpoint",
    "save_checkpoint",
    "save_samples",
    "get_vertex_checkpoint_path",
    "get_samples_dir",
    "torch_load",
    "torch_save",
]
