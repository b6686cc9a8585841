# TPU training/sampling image (replaces the reference's
# pytorch/pytorch:2.1.0-cuda11.8 base — Dockerfile:1).
FROM python:3.12-slim

WORKDIR /app

# jax[tpu] pulls libtpu for Cloud TPU VMs; torch (cpu) only for .pth
# validation tooling and optional HF models.
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY tinydiffusionmodels_tpu/ ./tinydiffusionmodels_tpu/
COPY bench.py ./

ENV TOKENIZERS_PARALLELISM=false
ENV PYTHONUNBUFFERED=1

# Default command mirrors the reference default (shakespeare training).
CMD ["python", "-m", "tinydiffusionmodels_tpu.shakespeare", "--train", \
     "--epochs", "100", "--batch_size", "64", "--use_learned_embeddings", \
     "--embed_dim", "256"]
