"""Arrow-batched pandas UDF wrappers over the scalar cores.

UDFs are the slow path (SURVEY guidance): these exist ONLY for the
operations Spark has no native expression for — address codecs (base58 +
blake2), multisig/sovereign account derivation, mortality math. Everything
else (decimal scaling, time bucketing, JSON access) stays JVM-side in
columns.py. Each UDF is vectorized over Arrow batches, so the per-row
Python cost is amortized ~1000x vs row-at-a-time UDFs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from polkadot_etl_spark.functions import scalars


@pandas_udf(T.StringType())
def u_get_pubkey(address: pd.Series) -> pd.Series:
    """ss58 → 0x-hex pubkey; invalid addresses → None (mirrors the
    reference's validAddress guard, indexer.js:251)."""

    def f(a):
        if a is None:
            return None
        try:
            return scalars.get_pubkey(a)
        except Exception:
            return None

    return address.map(f)


def u_get_address(network: int = 0):
    """ss58 encoder for a fixed network prefix (column → column)."""

    @pandas_udf(T.StringType())
    def _enc(pubkey: pd.Series) -> pd.Series:
        def f(p):
            if p is None:
                return None
            try:
                return scalars.get_address(p, network)
            except Exception:
                return None

        return pubkey.map(f)

    return _enc


@pandas_udf(T.StringType())
def u_compute_multisig(pubkeys: pd.Series, threshold: pd.Series) -> pd.Series:
    """(array<string> pubkeys, int threshold) → multisig account pubkey."""
    out = []
    for keys, th in zip(pubkeys, threshold):
        if keys is None or th is None:
            out.append(None)
        else:
            try:
                out.append(scalars.compute_multisig(list(keys), int(th)))
            except Exception:
                out.append(None)
    return pd.Series(out)


@pandas_udf(T.StringType())
def u_sovereign_account(para_id: pd.Series) -> pd.Series:
    return para_id.map(lambda p: None if p is None else scalars.sovereign_account(int(p)))


@pandas_udf(T.StructType([T.StructField("birth", T.LongType()), T.StructField("death", T.LongType())]))
def u_lifetime_birth_death(period: pd.Series, phase: pd.Series, current_block: pd.Series) -> pd.DataFrame:
    births, deaths = [], []
    for pe, ph, bn in zip(period, phase, current_block):
        if pe is None or ph is None or bn is None or int(pe) <= 0:
            births.append(None)
            deaths.append(None)
        else:
            b, d = scalars.lifetime_birth_death(int(pe), int(ph), int(bn))
            births.append(b)
            deaths.append(d)
    return pd.DataFrame({"birth": births, "death": deaths})
