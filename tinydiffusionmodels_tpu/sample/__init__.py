"""Samplers: the scanned ancestral/DDIM reverse loop and guided generation."""

from tinydiffusionmodels_tpu.sample.ancestral import sample_loop
from tinydiffusionmodels_tpu.sample.guided import guided_generate_scan, mix_logits

__all__ = ["sample_loop", "guided_generate_scan", "mix_logits"]
