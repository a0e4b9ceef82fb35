"""Optional Celery integration (used only when celery+redis are installed
and CELERY_ENABLED=1). Mirrors the reference's task wiring
(backend/app/workers/celery_app.py:7-21: Redis broker/backend, JSON
serialization, queue "gpu"). The native file queue (jobs.py) is the
default transport in broker-less deployments.
"""

from __future__ import annotations

from .. import config

try:
    from celery import Celery

    celery = Celery(
        "audiotabs_tpu",
        broker=config.settings.REDIS_URL,
        backend=config.settings.REDIS_URL,
    )
    celery.conf.update(
        task_serializer="json",
        result_serializer="json",
        accept_content=["json"],
        task_routes={"audiotabs_tpu.process_job": {"queue": "gpu"}},
    )

    @celery.task(name="audiotabs_tpu.process_job")
    def process_job_task(job_id: str) -> dict:
        from .jobs import JobManager

        return JobManager().process_job(job_id)

except ImportError:  # celery not installed: attribute access raises cleanly
    celery = None

    class _Unavailable:
        def delay(self, *a, **k):
            raise RuntimeError("celery is not installed")

    process_job_task = _Unavailable()
