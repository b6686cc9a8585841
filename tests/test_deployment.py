"""Deployment tooling tests (subprocess calls mocked, mirroring the
reference's mock-based testing style)."""

import json
import sys
from pathlib import Path
from unittest.mock import MagicMock, patch

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "deployment"))

import deploy  # noqa: E402
import monitor  # noqa: E402


class TestDeploy:
    def test_config_files_exist_for_all_job_types(self):
        for job in deploy.JOB_TYPES:
            assert (deploy.CONFIG_DIR / f"{job}.yaml").exists(), job

    def test_deploy_job_submits_with_config(self):
        fake = MagicMock(returncode=0, stdout=json.dumps(
            {"name": "projects/p/locations/r/customJobs/12345"}
        ))
        with patch.object(deploy, "run", return_value=fake) as mock_run:
            job_id = deploy.deploy_job(
                "mnist-training", project="p", region="r",
                no_build=True, image_uri="img",
            )
        assert job_id == "12345"
        cmd = mock_run.call_args[0][0]
        assert "gcloud" in cmd[0]
        assert any("mnist-training.yaml" in c for c in cmd)

    def test_build_failure_exits(self):
        with patch.object(deploy, "run", return_value=MagicMock(returncode=1)):
            with pytest.raises(SystemExit):
                deploy.build_container("img")

    def test_submission_failure_exits(self):
        fake = MagicMock(returncode=1, stderr="denied")
        with patch.object(deploy, "run", return_value=fake):
            with pytest.raises(SystemExit):
                deploy.deploy_job(
                    "mnist-training", project="p", region="r",
                    no_build=True, image_uri="img",
                )

    def test_configs_use_tpu_machines(self):
        for job in deploy.JOB_TYPES:
            text = (deploy.CONFIG_DIR / f"{job}.yaml").read_text()
            assert "ct5lp" in text, f"{job} must target TPU v5e"
            assert "tinydiffusionmodels_tpu" in text


class TestMonitor:
    def test_status_parse_and_format(self):
        payload = {
            "state": "JOB_STATE_RUNNING",
            "displayName": "mnist-training",
            "createTime": "2026-01-01T00:00:00Z",
            "jobSpec": {
                "workerPoolSpecs": [
                    {
                        "machineSpec": {
                            "machineType": "ct5lp-hightpu-8t",
                            "tpuTopology": "2x4",
                        },
                        "replicaCount": 1,
                    }
                ]
            },
        }
        with patch(
            "subprocess.run",
            return_value=MagicMock(returncode=0, stdout=json.dumps(payload)),
        ):
            status = monitor.get_job_status("1", project="p", region="r")
        out = monitor.format_job_status(status)
        assert "🏃" in out
        assert "ct5lp-hightpu-8t" in out
        assert "2x4" in out

    def test_status_failure_returns_none(self):
        with patch(
            "subprocess.run",
            return_value=MagicMock(returncode=1, stderr="nope"),
        ):
            assert monitor.get_job_status("1", project="p", region="r") is None

    def test_logs_query_filters_by_job_id(self):
        with patch(
            "subprocess.run",
            return_value=MagicMock(returncode=0, stdout="log line"),
        ) as mock_run:
            out = monitor.get_job_logs("42", project="p")
        assert out == "log line"
        cmd = mock_run.call_args[0][0]
        assert any('job_id="42"' in c for c in cmd)

    def test_logs_scoped_by_create_time_and_freshness(self):
        """Reference monitor.py:36-50: createTime timestamp filter, 7d
        freshness bound, and jsonPayload.message in the value format."""
        with patch(
            "subprocess.run",
            return_value=MagicMock(returncode=0, stdout="log line"),
        ) as mock_run:
            monitor.get_job_logs(
                "42", project="p", create_time="2026-01-01T00:00:00Z"
            )
        cmd = mock_run.call_args[0][0]
        query = cmd[3]
        assert 'job_id="42"' in query
        assert 'timestamp>="2026-01-01T00:00:00Z"' in query
        assert "--freshness=7d" in cmd
        fmt = next(c for c in cmd if c.startswith("--format"))
        assert "jsonPayload.message" in fmt and "textPayload" in fmt

    def test_logs_look_up_create_time_when_region_given(self):
        payload = {"state": "JOB_STATE_RUNNING",
                   "createTime": "2026-02-02T00:00:00Z"}
        describe = MagicMock(returncode=0, stdout=json.dumps(payload))
        read = MagicMock(returncode=0, stdout="line")
        with patch("subprocess.run", side_effect=[describe, read]) as mock_run:
            monitor.get_job_logs("7", project="p", region="r")
        query = mock_run.call_args_list[1][0][0][3]
        assert 'timestamp>="2026-02-02T00:00:00Z"' in query

    def test_full_dumps_raw_job_json(self, capsys):
        """Reference monitor.py:107-111: --full prints the whole job JSON."""
        payload = {"state": "JOB_STATE_SUCCEEDED", "displayName": "job",
                   "jobSpec": {"workerPoolSpecs": []}}
        with patch(
            "subprocess.run",
            return_value=MagicMock(returncode=0, stdout=json.dumps(payload)),
        ), patch.object(sys, "argv", ["monitor.py", "99", "--full"]):
            monitor.main()
        out = capsys.readouterr().out
        assert json.loads(out) == payload
