import os, time, sys
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from polkadot_etl_spark.benchutil import warm_session
from polkadot_etl_spark.session import get_spark
spark = get_spark(app_name="lt")
sf = os.environ["SPARK_GRAFT_SF_DIR"]
warm_session(spark, sf)
from polkadot_etl_spark.sources.tables import load_table
for name in ["lineitem", "documents", "embeddings", "events"]:
    ts = []
    for _ in range(6):
        t0 = time.time(); load_table(spark, sf, name); ts.append(round((time.time()-t0)*1000))
    print(f"## {name}: {ts} ms", file=sys.stderr)
