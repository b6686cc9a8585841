"""Unit tests for the fused-resblock VMEM block-size heuristic."""

from tinydiffusionmodels_tpu.ops.pallas_kernels import _batch_block, _lanes


class TestBatchBlock:
    def test_divides_batch(self):
        for b in (1, 2, 25, 64, 128):
            bb = _batch_block(b, hpwp=16 * 30, cin=32, cout=64)
            assert b % bb == 0
            assert 1 <= bb <= b

    def test_respects_vmem_budget(self):
        # Live f32 buffers are lane-padded to 128-column multiples; the
        # heuristic must keep the per-step footprint under the 10 MB budget.
        hpwp = 16 * 30
        cin, cout = 32, 64
        bb = _batch_block(128, hpwp=hpwp, cin=cin, cout=cout)
        rows = bb * hpwp
        footprint = 4 * rows * (3 * _lanes(cin) + 6 * _lanes(cout))
        assert footprint <= 10 * 1024 * 1024

    def test_lane_padding_accounted(self):
        # A 1-channel input costs full 128-lane buffers — the round-1 OOM:
        # the heuristic must not scale blocks up just because cin is tiny.
        narrow = _batch_block(128, hpwp=30 * 30, cin=1, cout=32)
        wide = _batch_block(128, hpwp=30 * 30, cin=128, cout=32)
        assert narrow <= 2 * wide

    def test_larger_channels_smaller_blocks(self):
        small_c = _batch_block(128, hpwp=16 * 30, cin=32, cout=32)
        large_c = _batch_block(128, hpwp=16 * 30, cin=128, cout=256)
        assert large_c <= small_c

    def test_big_image_falls_back_to_one(self):
        # A single image bigger than budget still yields bb=1 (kernel may
        # then exceed budget, but never returns 0).
        assert _batch_block(8, hpwp=10**6, cin=128, cout=128) == 1
