import os, sys, re
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from polkadot_etl_spark.session import get_spark
spark = get_spark(app_name="plan-cmp")
sf = os.environ["SPARK_GRAFT_SF_DIR"]
from polkadot_etl_spark.queries import QUERIES
import time
out = sys.argv[1]
names = ["snapshots_relay_opengov", "snapshots_staking_era", "snapshots_hydradx_omnipool",
         "snapshots_assethub_stablecoins", "snapshots_astar_dappstaking",
         "snapshots_dappstaking_v3", "snapshots_pricefeed"]
with open(out, "w") as fh:
    for n in names:
        for trial in range(2):
            t0 = time.time()
            df = QUERIES[n].build(spark, sf)
            t1 = time.time()
            print(f"## {n} t{trial} build={t1-t0:.2f}", file=sys.stderr)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        plan = re.sub(r"#\d+", "#N", plan)
        plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
        plan = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[N]", plan)
        fh.write(f"==== {n}\n{plan}\n")
