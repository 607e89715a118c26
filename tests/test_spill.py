"""Stage-output spill (Replicator / object-store fallback parity)."""

import numpy as np
import pyarrow as pa
import pytest

import jax

from ballista_tpu.client import SessionContext
from ballista_tpu.parallel.mesh import make_mesh
from ballista_tpu.scheduler.standalone import StandaloneCluster


@pytest.fixture(scope="module")
def cluster(tmp_path_factory):
    assert len(jax.devices()) >= 8
    ctx = SessionContext()
    rng = np.random.default_rng(3)
    n = 600
    ctx.register_arrow("f", pa.table({
        "k": pa.array(rng.integers(0, 40, n), pa.int64()),
        "v": pa.array(rng.integers(0, 100, n), pa.int64())}),
        primary_key=None)
    return StandaloneCluster(ctx, mesh=make_mesh(8),
                             work_dir=str(tmp_path_factory.mktemp("spill")))


SQL = "select k, sum(v) s from f group by k order by k"


def test_spill_files_written(cluster):
    df = cluster.sql(SQL)
    assert len(df) == 40
    job_id = next(iter(cluster.launcher.jobs))
    jc = cluster.launcher.jobs[job_id]
    # every non-final stage output spilled
    for sid in jc.stage_by_id:
        if str(sid) in jc.outputs:
            assert cluster.spiller.restore(job_id, sid,
                                           cluster.runtime.mesh) is not None


def test_restore_after_output_loss(cluster):
    import pandas as pd
    df = cluster.sql(SQL)
    job_id = list(cluster.launcher.jobs)[-1]
    jc = cluster.launcher.jobs[job_id]
    final = jc.dplan.final_stage
    # simulate executor loss: evict all in-memory stage outputs except
    # nothing — then re-run the FINAL stage only; inputs restore from spill
    saved_final = jc.outputs.pop(str(final))
    lost = dict(jc.outputs)
    jc.outputs.clear()
    jc.run_stage(final)
    import ballista_tpu.batch as B
    batch, schema = jc.final_batch()
    got = B.to_pandas(batch, schema)
    exp = df  # first run's result
    assert list(got["k"]) == list(exp["k"])
    assert list(got["s"]) == list(exp["s"])


def test_clean_job(cluster):
    job_id = next(iter(cluster.launcher.jobs))
    cluster.spiller.clean_job(job_id)
    assert cluster.spiller.restore(job_id, 0, cluster.runtime.mesh) is None


def test_spill_ttl_cleaner(tmp_path):
    """clean_expired removes only jobs older than the TTL; clean_all
    removes everything (shuffle-data TTL cleaner parity)."""
    import os
    import time
    from ballista_tpu.scheduler.spill import StageSpiller

    sp = StageSpiller(str(tmp_path))
    for job in ("old_job", "new_job"):
        d = os.path.join(str(tmp_path), job)
        os.makedirs(d)
        open(os.path.join(d, "stage_0.arrow"), "w").write("x")
    past = time.time() - 10_000
    os.utime(os.path.join(str(tmp_path), "old_job", "stage_0.arrow"),
             (past, past))
    removed = sp.clean_expired(ttl_seconds=5_000)
    assert removed == ["old_job"]
    assert os.path.isdir(os.path.join(str(tmp_path), "new_job"))
    sp.clean_all()
    assert not any(os.path.isdir(os.path.join(str(tmp_path), j))
                   for j in ("old_job", "new_job"))
