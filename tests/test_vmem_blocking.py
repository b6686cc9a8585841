"""Unit tests for the fused-resblock VMEM block-size heuristic."""

from tinydiffusionmodels_tpu.ops.pallas_kernels import _batch_block


class TestBatchBlock:
    def test_divides_batch(self):
        for b in (1, 2, 25, 64, 128):
            bb = _batch_block(b, hw=196, cmax=64)
            assert b % bb == 0
            assert 1 <= bb <= b

    def test_respects_vmem_budget(self):
        # 12 MB budget at ~160 B/row/channel.
        bb = _batch_block(128, hw=196, cmax=64)
        assert bb * 196 * 160 * 64 <= 12 * 1024 * 1024

    def test_larger_channels_smaller_blocks(self):
        small_c = _batch_block(128, hw=196, cmax=32)
        large_c = _batch_block(128, hw=196, cmax=128)
        assert large_c <= small_c

    def test_big_image_falls_back_to_one(self):
        # A single image bigger than budget still yields bb=1 (kernel may
        # then exceed budget, but never returns 0).
        assert _batch_block(8, hw=10**6, cmax=128) == 1
