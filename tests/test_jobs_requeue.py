import os
import time

from audiotabs_tpu.runtime.jobs import JobManager


def test_stale_claim_requeued(tmp_path):
    m = JobManager(tmp_path)
    job_id = m.create_job(b"RIFFxxxxWAVE", "x.wav")
    m.enqueue(job_id)
    assert m.queue_depth() == 1

    worker = "w1"
    claimed = m.claim_next(worker)
    assert claimed == job_id
    assert m.queue_depth() == 0

    # simulate a dead worker: age the claim file
    claim = m.queue_dir / "claimed" / f"{job_id}.{worker}"
    old = time.time() - 3600
    os.utime(claim, (old, old))

    assert m.requeue_stale_claims(max_age_s=1800) == 1
    assert m.queue_depth() == 1
    # fresh claims are not requeued
    m.claim_next("w2")
    assert m.requeue_stale_claims(max_age_s=1800) == 0


def test_done_job_claim_dropped(tmp_path):
    m = JobManager(tmp_path)
    job_id = m.create_job(b"RIFFxxxxWAVE", "x.wav")
    m.enqueue(job_id)
    m.claim_next("w1")
    m.storage.set_status(job_id, "done")
    claim = m.queue_dir / "claimed" / f"{job_id}.w1"
    old = time.time() - 3600
    os.utime(claim, (old, old))
    assert m.requeue_stale_claims(max_age_s=1800) == 0
    assert not claim.exists()
    assert m.queue_depth() == 0
