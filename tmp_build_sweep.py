import os, time, sys, json
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from polkadot_etl_spark.benchutil import warm_session
from polkadot_etl_spark.session import get_spark
spark = get_spark(app_name="build-sweep")
sf = os.environ["SPARK_GRAFT_SF_DIR"]
warm_session(spark, sf)
from polkadot_etl_spark.queries import QUERIES
out = {}
for n, q in QUERIES.items():
    try:
        q.build(spark, sf)  # cache-fill / warmup
        t0 = time.time(); q.build(spark, sf); out[n] = round(time.time() - t0, 3)
    except Exception as e:
        out[n] = f"ERR {type(e).__name__}"
json.dump(out, open("/tmp/build_sweep.json", "w"))
top = sorted((v, k) for k, v in out.items() if isinstance(v, float))[::-1][:30]
for v, k in top:
    print(f"## {k}: {v}", file=sys.stderr)
print("## total build:", round(sum(v for v in out.values() if isinstance(v, float)), 1), file=sys.stderr)
