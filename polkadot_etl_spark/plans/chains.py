"""Per-chain parser plugins (SURVEY §2.10 F1).

The reference has a 6,428-LoC base ChainParser with per-chain subclasses
(acala/astar/bifrost/interlay/moonbeam/parallel) overriding storage-key
decode, XCM extraction, and per-pallet asset semantics, dispatched by
chainID (reference substrate/chains/chainparser.js:188-3143,
substrate/indexer.js:6697-6755 setup_chainParser).

Spark translation: a parser produces CONFIG + COLUMN EXPRESSIONS, not
row loops — the base class carries the generic transfer-event layouts,
native token metadata, and suppress rules; subclasses override the
declarative bits. Dispatch is a registry keyed by chain_id, exactly like
setup_chainParser. Every hook returns DataFrames built from native
expressions, so a chain override never de-optimizes the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from polkadot_etl_spark.plans.decode import transfers_from_events


class ChainParser:
    """Base parser: generic Substrate semantics (chainparser.js base)."""

    chain_id: int = 0
    relay_chain: str = "polkadot"
    native_symbol: str = "DOT"
    native_decimals: int = 10
    ss58_prefix: int = 0

    # noise suppressed from published calls (assetManager.js:3214)
    suppress: tuple[tuple[str, str], ...] = (
        ("timestamp", "set"),
        ("paraInherent", "enter"),
        ("imOnline", "heartbeat"),
    )

    def transfers(self, events: DataFrame) -> DataFrame:
        """Typed transfers with this chain's native token config."""
        return transfers_from_events(
            events,
            native_symbol=self.native_symbol,
            native_decimals=self.native_decimals,
            ss58_prefix=self.ss58_prefix,
        )

    def is_suppressed(self, section: str, method: str) -> bool:
        return (section, method) in self.suppress


class MoonbeamParser(ChainParser):
    """EVM chain: 18-decimal native token, h160 accounts (prefix 1284),
    EVM logs decoded via functions/evm.py (chains/moonbeam.js)."""

    chain_id = 2004
    native_symbol = "GLMR"
    native_decimals = 18
    ss58_prefix = 1284


class AcalaParser(ChainParser):
    """ORML tokens chain: currencies/tokens pallets carry multi-asset
    transfers (chains/acala.js); 12-decimal native."""

    chain_id = 2000
    native_symbol = "ACA"
    native_decimals = 12
    ss58_prefix = 10


class KusamaParser(ChainParser):
    chain_id = 2
    relay_chain = "kusama"
    native_symbol = "KSM"
    native_decimals = 12
    ss58_prefix = 2


_PARSERS: dict[int, type[ChainParser]] = {
    p.chain_id: p for p in (ChainParser, KusamaParser, AcalaParser, MoonbeamParser)
}


def register_parser(cls: type[ChainParser]) -> type[ChainParser]:
    """Plugin hook: new chains register their subclass (decorator-friendly)."""
    _PARSERS[cls.chain_id] = cls
    return cls


def get_parser(chain_id: int) -> ChainParser:
    """setup_chainParser dispatch: specific parser or generic base."""
    return _PARSERS.get(chain_id, ChainParser)()
