#!/usr/bin/env python3
"""Build, push, and submit TPU training/sampling jobs.

Parity surface with reference deployment/deploy.py:93-107:

  python deployment/deploy.py {shakespeare,mnist}-{training,sampling} [--no-build]

Differences by design: the container is the JAX/TPU image (Dockerfile at the
repo root), configs request Cloud TPU accelerators (v5e) instead of a single
T4/V100 GPU, and image/project/region are configurable via flags or env
(TDM_IMAGE_URI, TDM_GCP_PROJECT, TDM_GCP_REGION) instead of being hardcoded.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
CONFIG_DIR = Path(__file__).resolve().parent / "configs"

DEFAULT_PROJECT = os.environ.get("TDM_GCP_PROJECT", "learnagentspace")
DEFAULT_REGION = os.environ.get("TDM_GCP_REGION", "us-central1")
DEFAULT_IMAGE = os.environ.get(
    "TDM_IMAGE_URI", f"gcr.io/{DEFAULT_PROJECT}/text-diffusion-tpu:latest"
)

JOB_TYPES = (
    "shakespeare-training",
    "shakespeare-sampling",
    "mnist-training",
    "mnist-sampling",
    # Framework extension: sequence-parallel long-context training
    # (ring attention over the v5e-8 ICI).
    "shakespeare-training-sp",
    # Framework extension: the round-3 measured-best quality stack
    # (x0 + zscore + frozen embeddings + RoPE + EMA, depth 6).
    "shakespeare-training-quality",
)


def run(cmd: list[str], **kwargs):
    print(f"$ {' '.join(cmd)}")
    return subprocess.run(cmd, **kwargs)


def build_container(image_uri: str) -> None:
    """docker build + push (reference deployment/deploy.py:13-46)."""
    result = run(["docker", "build", "-t", image_uri, str(REPO_ROOT)])
    if result.returncode != 0:
        print("❌ Container build failed")
        sys.exit(1)
    result = run(["docker", "push", image_uri])
    if result.returncode != 0:
        print("❌ Container push failed")
        sys.exit(1)
    print(f"✔ Built and pushed {image_uri}")


def deploy_job(job_type: str, *, project: str, region: str,
               no_build: bool, image_uri: str) -> str | None:
    """Submit a Vertex AI custom job from configs/{job_type}.yaml
    (reference deployment/deploy.py:48-91)."""
    if not no_build:
        build_container(image_uri)

    config_path = CONFIG_DIR / f"{job_type}.yaml"
    if not config_path.exists():
        print(f"❌ Config not found: {config_path}")
        sys.exit(1)

    result = run(
        [
            "gcloud", "ai", "custom-jobs", "create",
            f"--region={region}",
            f"--project={project}",
            f"--display-name={job_type}",
            f"--config={config_path}",
            "--format=json",
        ],
        capture_output=True,
        text=True,
    )
    if result.returncode != 0:
        print(f"❌ Job submission failed:\n{result.stderr}")
        sys.exit(1)

    try:
        job_info = json.loads(result.stdout)
        job_id = job_info.get("name", "").split("/")[-1]
    except (json.JSONDecodeError, IndexError):
        job_id = None

    print(f"✔ Submitted {job_type}")
    if job_id:
        print(f"  Job ID: {job_id}")
        print(f"  Monitor: python deployment/monitor.py {job_id}")
        print(f"  Logs:    python deployment/monitor.py {job_id} --logs")
    return job_id


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("job_type", choices=JOB_TYPES)
    parser.add_argument("--no-build", action="store_true",
                        help="skip docker build/push")
    parser.add_argument("--project", default=DEFAULT_PROJECT)
    parser.add_argument("--region", default=DEFAULT_REGION)
    parser.add_argument("--image", default=DEFAULT_IMAGE)
    args = parser.parse_args()
    deploy_job(
        args.job_type,
        project=args.project,
        region=args.region,
        no_build=args.no_build,
        image_uri=args.image,
    )


if __name__ == "__main__":
    main()
