import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from datafusion_pinot_spark.session import get_spark

    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def testdata(spark):
    from datafusion_pinot_spark.session import load_testdata

    return load_testdata(spark, SF_SMOKE)


@pytest.fixture(scope="session")
def pinot_table_dir(tmp_path_factory):
    """A 3-segment baseball_stats-style table in Pinot v3 format, plus a dim
    table — mirrors the reference's quickstart fixtures (FIXTURES.md §1-2)."""
    from pinot_segment.metadata import DataType
    from pinot_segment.var_byte import LZ4_LENGTH_PREFIXED
    from pinot_segment.writer import ColumnSpec, write_segment

    root = tmp_path_factory.mktemp("pinot_data")
    rng = np.random.RandomState(42)
    teams = [f"T{j:02d}" for j in range(30)]

    expected = {"playerID": [], "teamID": [], "hits": [], "homeRuns": []}
    base = 0
    for seg_i, n in enumerate([400, 300, 300]):
        cols = {
            "playerID": [f"player{base + j:05d}" for j in range(n)],
            "teamID": [teams[j] for j in rng.randint(0, 30, n)],
            "hits": rng.randint(0, 263, n).tolist(),
            "homeRuns": rng.randint(0, 74, n).tolist(),
        }
        base += n
        for k in expected:
            expected[k].extend(cols[k])
        write_segment(
            root / "baseball_OFFLINE" / f"seg{seg_i}",
            f"seg{seg_i}",
            "baseball",
            [
                ColumnSpec("playerID", DataType.STRING, cols["playerID"], raw=True,
                           compression=LZ4_LENGTH_PREFIXED, target_chunk_size=1024),
                ColumnSpec("teamID", DataType.STRING, cols["teamID"]),
                ColumnSpec("hits", DataType.INT, cols["hits"]),
                ColumnSpec("homeRuns", DataType.INT, cols["homeRuns"]),
            ],
        )
    # an ignored tmp dir (metadata_provider.rs:184-199)
    (root / "baseball_OFFLINE" / "tmp").mkdir()

    write_segment(
        root / "dimTeams_REALTIME" / "seg0",
        "seg0",
        "dimTeams",
        [
            ColumnSpec("teamID", DataType.STRING, teams),
            ColumnSpec("teamName", DataType.STRING, [f"Team {t}" for t in teams]),
        ],
    )
    return root, expected
