"""Dynamic per-pallet schema registry → typed event/call views.

The reference walks runtime metadata for every (section, method), maps
Substrate field types to BigQuery column types, and generates one typed
table/view per call/event kind (reference substrate/substrateetl.js:
5651-5726 setup_pallet, map_substratetype_to_bq_schematypes at :5697,
generateDuneViews at :5728 reading the latest specVersions.metadata).

Spark equivalent — no engine change needed: a registry of
(section, method) → StructType, built from the same metadata shape, and
`from_json` promotion of the JSON payload column into typed columns,
registered as temp views (``evt_{section}_{method}``). The promotion is
a map-side native expression: at 100 TB each typed view is a projection
over the events scan with the (section, method) filter pushed down to
the parquet row groups.

Type mapping (SURVEY §1.3):
- u8/u16/u32/i*      → LongType
- u64                → DecimalType(20,0) (u64 max exceeds long)
- u128/Balance       → DecimalType(38,0) numeric + the exact decimal
                       string kept alongside (``{field}_raw``) — the
                       dual-column rule the reference uses for balances
                       (schema/balances.json free_raw)
- bool               → BooleanType
- AccountId32/H160/H256/Bytes/String → StringType
- Vec<T>             → ArrayType(mapped T)
- Compact<T>         → mapped T
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INT_SMALL = {"u8", "u16", "u32", "i8", "i16", "i32", "i64", "BlockNumber", "EraIndex"}
_U64 = {"u64", "Moment"}
_U128 = {"u128", "Balance", "BalanceOf", "i128"}
_STRINGY = {"AccountId32", "AccountId", "H160", "H256", "Bytes", "String", "Text", "CallHash"}


def map_substrate_type(st: str) -> T.DataType:
    """Substrate type name → Spark type (map_substratetype_to_bq_schematypes
    analog, substrateetl.js:5697)."""
    st = st.strip()
    if st.startswith("Compact<") and st.endswith(">"):
        return map_substrate_type(st[8:-1])
    if st.startswith("Vec<") and st.endswith(">"):
        return T.ArrayType(map_substrate_type(st[4:-1]))
    if st.startswith("Option<") and st.endswith(">"):
        return map_substrate_type(st[7:-1])  # nullable anyway
    if st in _INT_SMALL:
        return T.LongType()
    if st in _U64:
        return T.DecimalType(20, 0)
    if st in _U128:
        return T.DecimalType(38, 0)
    if st == "bool":
        return T.BooleanType()
    if st in _STRINGY:
        return T.StringType()
    return T.StringType()  # unknown types stay raw JSON/string


def _is_u128(st: str) -> bool:
    st = st.strip()
    if st.startswith(("Compact<", "Option<")):
        return _is_u128(st[st.index("<") + 1 : -1])
    return st in _U128


@dataclass(frozen=True)
class PalletEvent:
    section: str
    method: str
    fields: tuple[tuple[str, str], ...]  # (name, substrate type)

    @property
    def struct(self) -> T.StructType:
        return T.StructType(
            [T.StructField(n, map_substrate_type(st), True) for n, st in self.fields]
        )

    @property
    def view_name(self) -> str:
        return f"evt_{self.section}_{self.method}".lower()


@dataclass
class PalletRegistry:
    """The engine's setup_pallet state: every known (section, method)."""

    events: dict[tuple[str, str], PalletEvent] = field(default_factory=dict)

    def register(self, section: str, method: str, fields: list[tuple[str, str]]) -> PalletEvent:
        ev = PalletEvent(section, method, tuple(fields))
        self.events[(section, method)] = ev
        return ev

    @classmethod
    def from_metadata(cls, metadata: dict) -> "PalletRegistry":
        """Build from a runtime-metadata-shaped dict:
        {"pallets": [{"name": "balances",
                      "events": [{"name": "Transfer",
                                  "fields": [{"name": "from", "type": "AccountId32"}, ...]}]}]}
        — the walk setup_pallet does over the decoded runtime metadata.
        """
        reg = cls()
        for pallet in metadata.get("pallets", []):
            section = pallet["name"]
            for ev in pallet.get("events", []):
                reg.register(
                    section,
                    ev["name"],
                    [(f["name"], f["type"]) for f in ev.get("fields", [])],
                )
        return reg

    def typed_events(
        self, events: DataFrame, section: str, method: str, payload_col: str = "data_decoded"
    ) -> DataFrame:
        """Typed projection of one event kind: filter (pushed to scan) +
        from_json promotion; u128 fields get a dual exact-string column
        ``{name}_raw`` (the balances free_raw rule)."""
        ev = self.events[(section, method)]
        base = events.where(
            (F.col("section") == section) & (F.col("method") == method)
        ).withColumn("__p", F.from_json(F.col(payload_col), ev.struct))
        cols = [c for c in events.columns]
        for name, st in ev.fields:
            if _is_u128(st):
                # parse once as string (exact), derive the numeric
                raw = F.get_json_object(F.col(payload_col), f"$.{name}")
                cols.append(raw.alias(f"{name}_raw"))
                cols.append(F.col("__p")[name].alias(name))
            else:
                cols.append(F.col("__p")[name].alias(name))
        return base.select(*cols).drop("__p")

    def generate_views(self, events: DataFrame, payload_col: str = "data_decoded") -> list[str]:
        """generateDuneViews analog: one temp view per registered kind."""
        names = []
        for section, method in sorted(self.events):
            ev = self.events[(section, method)]
            self.typed_events(events, section, method, payload_col).createOrReplaceTempView(
                ev.view_name
            )
            names.append(ev.view_name)
        return names
