"""session_configs: the local/cluster deployment profiles (SCALE.md).

The r4 verdict's top item: `spark.sql.files.maxPartitionBytes` was
hard-coded to 1 MB — right for the sandbox's single ~160 MB test file,
a driver-side scheduling blow-up (~10^8 splits) at 100 TB.  The config
set is now a pure function of the profile so both regimes are
assertable without building a SparkSession.
"""
from unfurl_spark.operators.pipeline import session_configs


def test_local_profile_sandbox_values():
    c = session_configs("local", master="local[8]", shuffle_partitions=8)
    assert c["spark.sql.files.maxPartitionBytes"] == "1m"
    # local shuffle never crosses a network: compression off
    assert c["spark.shuffle.compress"] == "false"
    assert c["spark.shuffle.spill.compress"] == "false"
    assert c["spark.sql.shuffle.partitions"] == "8"
    # no executor shaping in local mode
    assert "spark.executor.memory" not in c
    assert "spark.checkpoint.dir" not in c


def test_cluster_profile_scale_values():
    c = session_configs("cluster", master="yarn", shuffle_partitions=32000)
    # one split per ~256 MB Iceberg file → ~400k tasks at 100 TB
    assert c["spark.sql.files.maxPartitionBytes"] == "256m"
    # ~100 TB crosses the network: compression on
    assert c["spark.shuffle.compress"] == "true"
    assert c["spark.shuffle.spill.compress"] == "true"
    # SCALE.md executor arithmetic: 16 cores × 16 GB + pyspark worker pool
    assert c["spark.executor.cores"] == "16"
    assert c["spark.executor.memory"] == "16g"
    assert c["spark.executor.pyspark.memory"] == "6g"
    # durable checkpoint dir for the resumable driver
    assert c["spark.checkpoint.dir"]
    # never inherits the sandbox's tmpfs local dir
    assert "spark.local.dir" not in c


def test_cluster_checkpoint_dir_override():
    c = session_configs("cluster", checkpoint_dir="hdfs:///ckpt/unfurl")
    assert c["spark.checkpoint.dir"] == "hdfs:///ckpt/unfurl"


def test_shared_invariants_both_profiles():
    for p in ("local", "cluster"):
        c = session_configs(p, master="local[8]" if p == "local" else "yarn")
        assert c["spark.sql.adaptive.enabled"] == "true"
        assert c["spark.sql.adaptive.skewJoin.enabled"] == "true"
        assert c["spark.sql.execution.arrow.pyspark.enabled"] == "true"
        assert c["spark.sql.session.timeZone"] == "UTC"


def test_session_profile_defaults_by_master():
    # pure-function check of the dispatch rule used by session()
    from unfurl_spark.operators import pipeline
    import inspect
    src = inspect.getsource(pipeline.session)
    assert 'startswith("local")' in src  # local master → local profile
