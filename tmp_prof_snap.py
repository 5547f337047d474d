import os, cProfile, pstats, sys, io
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from polkadot_etl_spark.benchutil import warm_session
from polkadot_etl_spark.session import get_spark
spark = get_spark(app_name="snap-prof")
sf = os.environ["SPARK_GRAFT_SF_DIR"]
warm_session(spark, sf)
from polkadot_etl_spark.queries import QUERIES
QUERIES["snapshots_relay_opengov"].build(spark, sf)  # warm the memo paths
pr = cProfile.Profile()
pr.enable()
QUERIES["snapshots_relay_opengov"].build(spark, sf)
pr.disable()
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(28)
print(s.getvalue())
