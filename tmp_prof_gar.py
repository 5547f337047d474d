import os, cProfile, pstats, io
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from polkadot_etl_spark.benchutil import warm_session
from polkadot_etl_spark.session import get_spark
spark = get_spark(app_name="gar-prof")
sf = os.environ["SPARK_GRAFT_SF_DIR"]
warm_session(spark, sf)
from polkadot_etl_spark.queries import QUERIES
QUERIES["gar_chain_registry"].build(spark, sf)
pr = cProfile.Profile(); pr.enable()
QUERIES["gar_chain_registry"].build(spark, sf)
pr.disable()
s = io.StringIO(); ps = pstats.Stats(pr, stream=s).sort_stats("cumulative"); ps.print_stats(24)
print(s.getvalue())
