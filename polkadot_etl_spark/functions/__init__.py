from polkadot_etl_spark.functions import scalars
from polkadot_etl_spark.functions.columns import (
    inverted_ts_key,
    log_dt_hr,
    to_base_unit,
    ts_to_log_dt,
)
from polkadot_etl_spark.functions.udfs import (
    u_compute_multisig,
    u_get_address,
    u_get_pubkey,
    u_lifetime_birth_death,
    u_sovereign_account,
)

__all__ = [
    "scalars",
    "inverted_ts_key",
    "log_dt_hr",
    "to_base_unit",
    "ts_to_log_dt",
    "u_compute_multisig",
    "u_get_address",
    "u_get_pubkey",
    "u_lifetime_birth_death",
    "u_sovereign_account",
]
