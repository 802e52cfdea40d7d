"""Real-MLflow compatibility tier.

The reference logs through the real mlflow client (reference
``utilities/mlflow/io.py:8-33``, ``main.py:75-120``); this repo's
``utils/tracking.py`` re-implements the FileStore contract and delegates to
the live client for remote URIs. These tests prove both claims against the
REAL ``mlflow`` package:

1. FileStore interop — runs written by our tracker are readable by a stock
   ``mlflow.MlflowClient`` pointed at the same directory (params, step-indexed
   metric histories, tags, the ``mlflow.parentRunId`` sweep convention).
2. Remote delegation — with a genuine ``mlflow server`` subprocess on
   localhost, ``set_tracking_uri("http://...")`` routes every call through
   the live client and the server's store shows the data.

They skip (visibly) when ``mlflow`` is not importable — the CI ``compat``
job installs it and asserts no skips.
"""

import socket
import subprocess
import sys
import time

import pytest

mlflow = pytest.importorskip("mlflow")

from anap3_tpu.utils import tracking as T


@pytest.fixture()
def store(tmp_path, monkeypatch):
    """Fresh tracker state against a tmp FileStore root."""
    monkeypatch.setitem(T._state, "uri", tmp_path / "mlruns")
    monkeypatch.setitem(T._state, "experiment_id", None)
    monkeypatch.setitem(T._state, "mlflow", None)
    monkeypatch.setattr(T._local, "stack", [], raising=False)
    return tmp_path / "mlruns"


class TestFileStoreInterop:
    """Stock MlflowClient reads what utils/tracking.py writes."""

    def _write_parent_child(self):
        T.set_experiment("interop-exp")
        parent = T.start_run(run_name="sweep-parent", tags={"purpose": "sweep"})
        T.log_params({"Re": 1000, "N": 96, "solver": "spectral/fsg"})
        for step, val in enumerate([1.0, 0.5, 0.25]):
            T.log_metric("residual", val, step=step)
        parent_id = parent.run_id
        T.end_run()

        child = T.start_run(run_name="member-0",
                            tags={"mlflow.parentRunId": parent_id})
        T.log_params({"Re": 400})
        T.log_metric("u_L2_error", 0.0123, step=0)
        child_id = child.run_id
        T.end_run()
        return parent_id, child_id

    def test_stock_client_reads_our_store(self, store):
        parent_id, child_id = self._write_parent_child()

        client = mlflow.MlflowClient(tracking_uri=store.as_uri())
        exps = {e.name: e for e in client.search_experiments()}
        assert "interop-exp" in exps

        parent = client.get_run(parent_id)
        assert parent.data.params["Re"] == "1000"
        assert parent.data.params["solver"] == "spectral/fsg"
        assert parent.data.tags["purpose"] == "sweep"
        assert parent.info.status == "FINISHED"

        hist = client.get_metric_history(parent_id, "residual")
        assert [(m.step, m.value) for m in hist] == [(0, 1.0), (1, 0.5), (2, 0.25)]

        child = client.get_run(child_id)
        assert child.data.tags["mlflow.parentRunId"] == parent_id
        assert child.data.metrics["u_L2_error"] == pytest.approx(0.0123)

    def test_stock_search_finds_children(self, store):
        parent_id, child_id = self._write_parent_child()
        client = mlflow.MlflowClient(tracking_uri=store.as_uri())
        exp = client.get_run(parent_id).info.experiment_id
        runs = client.search_runs(
            [exp], f"tags.`mlflow.parentRunId` = '{parent_id}'")
        assert [r.info.run_id for r in runs] == [child_id]

    def test_we_read_stock_clients_store(self, store):
        """Symmetric direction: tracker reads a store the real client wrote."""
        client = mlflow.MlflowClient(tracking_uri=store.as_uri())
        exp_id = client.create_experiment("stock-exp")
        run = client.create_run(exp_id, run_name="stock-run")
        client.log_param(run.info.run_id, "Re", "3200")
        client.log_metric(run.info.run_id, "energy", 0.031, step=5)
        client.set_terminated(run.info.run_id)

        rows = T.search_runs(experiment_name="stock-exp")
        assert len(rows) == 1
        assert rows[0]["params"]["Re"] == "3200"
        hist = T.get_metric_history(run.info.run_id, "energy")
        assert hist[-1][0] == 5 and hist[-1][1] == pytest.approx(0.031)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mlflow_server(tmp_path_factory):
    """A real ``mlflow server`` on localhost (the delegation target)."""
    root = tmp_path_factory.mktemp("server-store")
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, "-m", "mlflow", "server",
         "--backend-store-uri", str(root / "mlruns"),
         "--default-artifact-root", str(root / "artifacts"),
         "--host", "127.0.0.1", "--port", str(port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    uri = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if proc.poll() is not None:
                pytest.skip("mlflow server exited at startup")
            try:
                with socket.create_connection(("127.0.0.1", port), timeout=1):
                    break
            except OSError:
                time.sleep(0.5)
        else:
            pytest.skip("mlflow server did not come up in 90s")
        yield uri
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


class TestRemoteDelegation:
    """http:// URIs route every tracking call through the live client."""

    def test_roundtrip_through_real_server(self, mlflow_server, monkeypatch):
        monkeypatch.setattr(T._local, "stack", [], raising=False)
        T.set_tracking_uri(mlflow_server)
        try:
            assert T._mlflow() is not None, "http URI must arm delegation"
            T.set_experiment("delegated-exp")
            run = T.start_run(run_name="delegated-run")
            T.log_params({"Re": 100})
            T.log_metric("residual", 0.5, step=1)
            T.set_tag("tier", "compat")
            run_id = run.run_id
            T.end_run()
        finally:
            T.set_tracking_uri("./mlruns")

        client = mlflow.MlflowClient(tracking_uri=mlflow_server)
        got = client.get_run(run_id)
        assert got.data.params["Re"] == "100"
        assert got.data.tags["tier"] == "compat"
        hist = client.get_metric_history(run_id, "residual")
        assert [(m.step, m.value) for m in hist] == [(1, 0.5)]
