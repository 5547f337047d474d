from polkadot_etl_spark.operators.asof import asof_join
from polkadot_etl_spark.operators.band import band_join_best_match
from polkadot_etl_spark.operators.topn import top_n_per_group

__all__ = ["asof_join", "band_join_best_match", "top_n_per_group"]
