"""PySpark binding for the graft engine — the Python-parity surface the
reference ships as its own package (reference: `crates/glaredb_python`,
`connect()` returning a session with `.sql()`/`.execute()`).

graft is a JVM library; this module is pure glue over the py4j gateway:
given any PySpark ``SparkSession`` whose JVM classpath carries the graft
classes (``--jars graft.jar`` or ``--driver-class-path target/scala-2.13/
classes``), it registers the engine's compat functions, aggregate sketches,
and TVFs, and exposes the path-as-table / ``read_*`` SQL sugar.

Typical use::

    from pyspark.sql import SparkSession
    import graft

    spark = SparkSession.builder.getOrCreate()
    graft.register(spark)
    graft.sql(spark, "SELECT count(*) FROM 'data/lineitem.parquet'").show()
"""

from pyspark.sql import DataFrame, SparkSession

__all__ = ["register", "sql", "table", "connect"]


def _jvm(spark: SparkSession):
    jvm = spark._jvm
    if jvm is None:  # pragma: no cover - only under Spark Connect
        raise RuntimeError(
            "graft needs a classic (JVM-gateway) SparkSession; "
            "Spark Connect sessions don't expose the graft classes")
    return jvm


def register(spark: SparkSession) -> SparkSession:
    """Register graft's full function surface on this session.

    Installs the GlareDB-compat scalar/table functions, the native vector
    expressions (l2_distance & friends), the sketch aggregates
    (hll_sketch/topk_sketch), and the exact-decimal-sum optimizer rule.
    Idempotent; returns the session for chaining.
    """
    jvm = _jvm(spark)
    js = spark._jsparkSession
    jvm.graft.functions.GlareCompat.register(js)
    jvm.graft.functions.GraftFunctions.register(js)
    jvm.graft.functions.Aggregators.register(js)
    jvm.graft.functions.HeavyHitters.register(js)
    jvm.graft.Engine.ensureOptimizations(js)
    return spark


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run SQL with graft's source sugar resolved.

    Supports ``FROM 'path.parquet'`` path-as-table, ``read_parquet/
    read_csv/read_text/read_delta/read_iceberg`` (incl. time travel),
    ``tpch_gen.<table>(sf)``, ``iceberg.*``/``parquet.*`` metadata TVFs —
    the same rewrite the Scala `GraftSession.sql` applies.
    """
    jdf = _jvm(spark).graft.sources.GraftSession.sql(
        spark._jsparkSession, query)
    return DataFrame(jdf, spark)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Register one driver-fixture table (``<sf_dir>/<name>.parquet``) as a
    temp view through the engine's schema-cached reader and return it."""
    jdf = _jvm(spark).graft.Engine.table(spark._jsparkSession, sf_dir, name)
    return DataFrame(jdf, spark)


def connect(app_name: str = "graft", master: str = None) -> SparkSession:
    """Convenience mirror of the reference's ``glaredb.connect()``: build
    (or reuse) a SparkSession and register the graft surface on it."""
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    return register(builder.getOrCreate())
