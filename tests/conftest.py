import os

import pytest

# stub-model outputs are identical with or without the transformer-shaped
# compute emulation (see kgflow/fixtures/stub_model.py); tests turn it off
# for speed, bench keeps it on so the model stage stays the bottleneck
os.environ.setdefault("KGFLOW_EMULATE_COMPUTE", "0")

# At the 4-CPU test session the shipped pool floor (0.9·N → 3 actors)
# leaves ONE task CPU, and a rare Ray scheduling race between the
# pool's scale-to-max request and a pending read task can deadlock the
# stream (observed once: 3 idle actors + 1 unscheduled ReadParquet for
# 60+ min in test_schema). Halving the floor in TESTS keeps two CPUs
# of task slack; bench/scaling keep the measured production default.
os.environ.setdefault("KGFLOW_POOL_MIN", "0.5")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
