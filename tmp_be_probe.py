import os, time, sys
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from polkadot_etl_spark.benchutil import warm_session
from polkadot_etl_spark.session import get_spark
spark = get_spark(app_name="be-probe")
sf = os.environ["SPARK_GRAFT_SF_DIR"]
warm_session(spark, sf)
from polkadot_etl_spark.queries import QUERIES

for name in ["snapshots_relay_opengov", "ann_ivf_trained_search", "gar_longtail_registry", "snapshots_staking_era", "snapshots_hydradx_omnipool"]:
    for trial in range(2):
        t0 = time.time()
        df = QUERIES[name].build(spark, sf)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        print(f"## {name} t{trial}: build={t1-t0:.2f} exec={t2-t1:.2f}", file=sys.stderr)
