#!/usr/bin/env python3
"""Monitor Vertex AI custom jobs (parity with reference deployment/monitor.py).

  python deployment/monitor.py JOB_ID            # status
  python deployment/monitor.py JOB_ID --logs     # recent logs
  python deployment/monitor.py JOB_ID --full     # status + logs
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

DEFAULT_PROJECT = os.environ.get("TDM_GCP_PROJECT", "learnagentspace")
DEFAULT_REGION = os.environ.get("TDM_GCP_REGION", "us-central1")

STATE_EMOJI = {
    "JOB_STATE_QUEUED": "⏳",
    "JOB_STATE_PENDING": "⏳",
    "JOB_STATE_RUNNING": "🏃",
    "JOB_STATE_SUCCEEDED": "✅",
    "JOB_STATE_FAILED": "❌",
    "JOB_STATE_CANCELLING": "🛑",
    "JOB_STATE_CANCELLED": "🛑",
    "JOB_STATE_PAUSED": "⏸️",
    "JOB_STATE_EXPIRED": "⌛",
}


def get_job_status(job_id: str, *, project: str, region: str) -> dict | None:
    """gcloud describe -> parsed JSON (reference monitor.py:12-29)."""
    result = subprocess.run(
        [
            "gcloud", "ai", "custom-jobs", "describe", job_id,
            f"--region={region}", f"--project={project}", "--format=json",
        ],
        capture_output=True,
        text=True,
    )
    if result.returncode != 0:
        print(f"❌ Failed to get job status:\n{result.stderr}")
        return None
    try:
        return json.loads(result.stdout)
    except json.JSONDecodeError:
        print("❌ Could not parse job status JSON")
        return None


def get_job_logs(
    job_id: str,
    *,
    project: str,
    limit: int = 100,
    create_time: str | None = None,
    region: str | None = None,
) -> str | None:
    """gcloud logging read filtered by job id (reference monitor.py:32-56).

    Reference fidelity: the query is scoped to entries at or after the job's
    createTime (reference monitor.py:36-41) so stale/foreign entries from a
    recycled job id can't leak in, the read is bounded by ``--freshness 7d``
    (monitor.py:50), and structured container logs are surfaced via
    ``jsonPayload.message`` alongside ``textPayload`` (monitor.py:48).
    ``create_time`` is looked up from the job when not supplied.
    """
    if create_time is None and region is not None:
        status = get_job_status(job_id, project=project, region=region)
        if status is not None:
            create_time = status.get("createTime", "")
    query = f'resource.labels.job_id="{job_id}"'
    if create_time:
        query += f' timestamp>="{create_time}"'
    result = subprocess.run(
        [
            "gcloud", "logging", "read",
            query,
            f"--project={project}",
            f"--limit={limit}",
            "--format=value(timestamp,severity,textPayload,jsonPayload.message)",
            "--freshness=7d",
            "--order=desc",
        ],
        capture_output=True,
        text=True,
    )
    if result.returncode != 0:
        print(f"❌ Failed to fetch logs:\n{result.stderr}")
        return None
    return result.stdout


def format_job_status(status: dict) -> str:
    """Human status line with emoji map (reference monitor.py:59-85)."""
    state = status.get("state", "UNKNOWN")
    emoji = STATE_EMOJI.get(state, "❓")
    lines = [
        f"{emoji} State: {state}",
        f"   Name: {status.get('displayName', '?')}",
        f"   Created: {status.get('createTime', '?')}",
    ]
    if "startTime" in status:
        lines.append(f"   Started: {status['startTime']}")
    if "endTime" in status:
        lines.append(f"   Ended: {status['endTime']}")
    if "error" in status:
        lines.append(f"   Error: {status['error'].get('message', '?')}")
    pools = status.get("jobSpec", {}).get("workerPoolSpecs", [])
    if pools:
        machine = pools[0].get("machineSpec", {})
        lines.append(
            f"   Machine: {machine.get('machineType', '?')} "
            f"x{pools[0].get('replicaCount', 1)} "
            f"(tpu_topology={machine.get('tpuTopology', '-')})"
        )
    return "\n".join(lines)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("job_id")
    parser.add_argument("--logs", action="store_true", help="show logs only")
    parser.add_argument("--full", action="store_true",
                        help="dump the complete job JSON")
    parser.add_argument("--project", default=DEFAULT_PROJECT)
    parser.add_argument("--region", default=DEFAULT_REGION)
    args = parser.parse_args()

    if args.logs:
        logs = get_job_logs(
            args.job_id, project=args.project, region=args.region
        )
        if logs is not None:
            print(logs.strip() or "(no logs yet)")
        else:
            sys.exit(1)
        return

    status = get_job_status(
        args.job_id, project=args.project, region=args.region
    )
    if status is None:
        sys.exit(1)
    if args.full:
        # Reference --full dumps the raw job JSON (monitor.py:107-111).
        print(json.dumps(status, indent=2))
    else:
        print(format_job_status(status))


if __name__ == "__main__":
    main()
