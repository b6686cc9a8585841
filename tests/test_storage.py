"""Unit tests for the storage layer (mock-based, mirroring the reference's
test strategy — reference tests/test_utils.py)."""

import os
from pathlib import Path
from unittest.mock import MagicMock, patch

import pytest

from tinydiffusionmodels_tpu.io import (
    is_gcs_path,
    parse_gcs_path,
    get_vertex_checkpoint_path,
    get_samples_dir,
)


class TestGcsPathPredicates:
    def test_gcs_paths(self):
        assert is_gcs_path("gs://bucket/blob")
        # Note: Path("gs://...") collapses '//' to '/', which is why the
        # storage layer keeps gs:// paths as str end to end.
        assert not is_gcs_path(Path("gs://bucket/blob"))

    def test_non_gcs_paths(self):
        assert not is_gcs_path("/local/path")
        assert not is_gcs_path("s3://bucket/key")
        assert not is_gcs_path("relative.pth")

    def test_parse(self):
        assert parse_gcs_path("gs://bucket/a/b.pth") == ("bucket", "a/b.pth")
        assert parse_gcs_path("gs://bucket") == ("bucket", "")

    def test_parse_rejects_non_gcs(self):
        with pytest.raises(ValueError):
            parse_gcs_path("s3://bucket/key")


class TestGcsTransfer:
    def test_download_calls(self):
        with patch(
            "tinydiffusionmodels_tpu.io.storage._gcs_client"
        ) as client_fn:
            client = MagicMock()
            client_fn.return_value = client
            from tinydiffusionmodels_tpu.io import download_from_gcs

            download_from_gcs("gs://b/k.pth", "/tmp/x.pth")
            client.bucket.assert_called_once_with("b")
            client.bucket().blob.assert_called_with("k.pth")
            client.bucket().blob().download_to_filename.assert_called_once_with(
                "/tmp/x.pth"
            )

    def test_upload_calls(self):
        with patch(
            "tinydiffusionmodels_tpu.io.storage._gcs_client"
        ) as client_fn:
            client = MagicMock()
            client_fn.return_value = client
            from tinydiffusionmodels_tpu.io import upload_to_gcs

            upload_to_gcs("/tmp/x.pth", "gs://b/k.pth")
            client.bucket().blob().upload_from_filename.assert_called_once_with(
                "/tmp/x.pth"
            )

    def test_gcs_load_error_wrapped(self):
        from tinydiffusionmodels_tpu.io import load_checkpoint

        with patch(
            "tinydiffusionmodels_tpu.io.storage.download_from_gcs",
            side_effect=Exception("boom"),
        ):
            with pytest.raises(RuntimeError, match="Failed to download"):
                load_checkpoint("gs://b/k.pth")

    def test_gcs_save_error_wrapped(self):
        from tinydiffusionmodels_tpu.io import save_checkpoint

        with patch(
            "tinydiffusionmodels_tpu.io.storage.upload_to_gcs",
            side_effect=Exception("boom"),
        ):
            with pytest.raises(RuntimeError, match="Failed to upload"):
                save_checkpoint({"a": 1}, "gs://b/k.pth")


class TestVertexPaths:
    def test_checkpoint_path_local(self):
        with patch.dict(os.environ, {}, clear=True):
            assert get_vertex_checkpoint_path("m.pth") == "m.pth"

    def test_checkpoint_path_vertex(self):
        with patch.dict(os.environ, {"AIP_MODEL_DIR": "gs://bkt/out"}, clear=True):
            assert get_vertex_checkpoint_path("m.pth") == "gs://bkt/out/m.pth"

    def test_samples_dir_local(self):
        with patch.dict(os.environ, {}, clear=True):
            d = get_samples_dir("samples")
            assert isinstance(d, Path)
            assert str(d) == "samples"

    def test_samples_dir_gcs_returns_str(self):
        """gs:// must come back as str, not Path (Path collapses '//') —
        reference src/utils.py:133-138."""
        with patch.dict(
            os.environ, {"AIP_MODEL_DIR": "gs://bkt/out/"}, clear=True
        ):
            d = get_samples_dir("samples")
            assert isinstance(d, str)
            assert d == "gs://bkt/out/samples"

    def test_samples_dir_local_model_dir(self):
        with patch.dict(os.environ, {"AIP_MODEL_DIR": "/mnt/out"}, clear=True):
            d = get_samples_dir("samples")
            assert isinstance(d, Path)
            assert str(d) == "/mnt/out/samples"
