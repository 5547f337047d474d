import os, time, sys
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from polkadot_etl_spark.benchutil import warm_session
from polkadot_etl_spark.session import get_spark
spark = get_spark(app_name="build2")
sf = os.environ["SPARK_GRAFT_SF_DIR"]
warm_session(spark, sf)
from polkadot_etl_spark.queries import QUERIES
for n in ["gar_chain_registry", "snapshots_staking_era", "users_tags_attribution", "address_topn_metrics", "bpe_fertility_audit", "xcm_messages_published", "evm_accounts_daily"]:
    ts = []
    for trial in range(3):
        t0 = time.time(); QUERIES[n].build(spark, sf); ts.append(round(time.time()-t0, 2))
    print(f"## {n}: {ts}", file=sys.stderr)
