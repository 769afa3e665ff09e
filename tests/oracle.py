"""Independent single-threaded CDC replay oracle.

A plain-Python, STRICTLY SEQUENTIAL re-implementation of the reference's
apply semantics (NormalWriteRecorder: upsert-on-PK / partial update /
delete-by-PK, applied in source order per key — SURVEY.md §5): events are
applied ONE AT A TIME in (warc_ts, event_seq) order within each delivery
slice, with per-key redelivery guards. It shares no folding/batching logic
with the engine — batch-fold bugs (e.g. delete-then-update collapsing)
cannot hide in a mirrored implementation.

Semantics:
- slices (epoch / DDL-barrier units) arrive in order; within a slice the
  total order is (warc_ts, event_seq);
- an event applies only if its order is strictly newer than the key's last
  APPLIED order (duplicate / stale redelivery guard — exactlyOnceId
  analog, MysqlReader.java:851-854);
- insert = full row image; update = partial (null column means unchanged,
  removed_fields nulls explicitly); delete removes the row but records its
  order (tombstone) so older redeliveries cannot resurrect it;
- ignored events (update-on-missing under the default policy, insert on
  existing under ignore_on_exists) do NOT advance the key's order;
- write policies per WritePolicyEnum.java:3-11;
- DDL (ADD/RENAME/WIDEN) applies between slices, in order;
- `text` recomputes from html whenever html changes (byte-identical
  extraction contract, fixture F12).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from tapdata_connectors_spark.functions.text_extract import extract_text_bytes


def _cast(val: str | None, type_: str) -> Any:
    if val is None:
        return None
    t = type_.lower()
    if t in ("int", "bigint", "smallint"):
        return int(val)
    if t in ("double", "float"):
        return float(val)
    if t == "boolean":
        return val.lower() in ("true", "1")
    if t.startswith("decimal"):
        from decimal import Decimal

        _p, s = t[t.find("(") + 1 : t.find(")")].split(",")
        return Decimal(val).quantize(Decimal(1).scaleb(-int(s)))
    return val


_BASE_IMAGE = ("warc_ts", "html", "lang")


@dataclass
class OracleReplayer:
    insert_policy: str = "update_on_exists"
    update_policy: str = "ignore_on_nonexists"
    # logical schema: ordered (name, type); position 2 is html at creation
    columns: list[tuple[str, str]] = field(
        default_factory=lambda: [
            ("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
            ("text", "string"), ("lang", "string"),
        ]
    )
    state: dict[str, dict] = field(default_factory=dict)
    last_ord: dict[str, tuple] = field(default_factory=dict)
    n_null_pk: int = 0  # skipped records with no derivable PK
    # image-field name history: current logical name per original image field
    image_names: dict[str, str] = field(
        default_factory=lambda: {"warc_ts": "warc_ts", "html": "html", "lang": "lang"}
    )

    # ---- schema evolution (between slices) ----
    def apply_ddl(self, kind: str, column: str, new_name=None, new_type=None,
                  new_default=None):
        names = [c[0] for c in self.columns]
        if kind == "ADD_COLUMN":
            assert column not in names
            self.columns.append((column, new_type))
            # initial default: rows that existed before the ADD read it back
            dv = _cast(new_default, new_type) if new_default is not None else None
            for row in self.state.values():
                row.setdefault(column, dv)
        elif kind == "RENAME_COLUMN":
            i = names.index(column)
            self.columns[i] = (new_name, self.columns[i][1])
            for row in self.state.values():
                row[new_name] = row.pop(column, None)
            for orig, cur in self.image_names.items():
                if cur == column:
                    self.image_names[orig] = new_name
        elif kind == "TYPE_WIDEN":
            i = names.index(column)
            self.columns[i] = (column, new_type)
        elif kind == "DROP_COLUMN":
            self.columns = [c for c in self.columns if c[0] != column]
            for row in self.state.values():
                row.pop(column, None)
        else:
            raise ValueError(kind)

    # ---- one delivery slice: sequential event-at-a-time apply ----
    def apply_slice(self, events: list[dict]) -> None:
        evs = sorted(events, key=lambda e: (e["warc_ts"], e["event_seq"]))
        for e in evs:
            self._apply_event(e)

    def _payload(self) -> list[tuple[str, str]]:
        return [(n, t) for n, t in self.columns if n not in ("url", "text")]

    def _html_name(self) -> str:
        return self.image_names["html"]

    def _event_values(self, e: dict) -> dict[str, tuple[bool, Any]]:
        """Per payload column: (mentioned, value) for this event."""
        after = e.get("after") or {}
        extras = e.get("extras") or {}
        removed = set(e.get("removed_fields") or [])
        cur_to_orig = {cur: orig for orig, cur in self.image_names.items()}
        out: dict[str, tuple[bool, Any]] = {}
        for n, ty in self._payload():
            if n in removed:
                out[n] = (True, None)
            elif n in cur_to_orig:  # image-struct column (fixed physical slot)
                v = after.get(cur_to_orig[n])
                out[n] = (v is not None, v)
            else:  # DDL-added column, delivered via extras
                out[n] = (n in extras, _cast(extras.get(n), ty))
        return out

    def _apply_event(self, e: dict) -> None:
        op = e["op"]
        # PK resolution: event key, else after-image key, else before-image
        # key (Debezium-shaped deletes carry the PK only in `before`)
        url = e["url"]
        if url is None:
            url = (e.get("after") or {}).get("url") or (e.get("before") or {}).get("url")
        if url is None:
            # null-PK record: skip and count (NormalWriteRecorder.java:210-226)
            self.n_null_pk += 1
            return
        # update-of-PK: delete the old key, insert the after image as the
        # new row — hudi ClientPerformer.java:107-132
        b_url = (e.get("before") or {}).get("url")
        if op == "U" and b_url is not None and b_url != url:
            self._apply_event({**e, "op": "D", "url": b_url, "before": None,
                               "after": None})
            self._apply_event({**e, "op": "I", "url": url, "before": None})
            return
        ordk = (e["warc_ts"], e["event_seq"])
        prev = self.last_ord.get(url)
        if prev is not None and ordk <= prev:
            return  # duplicate or stale redelivery
        live = url in self.state

        if op == "D":
            # delete-by-PK; applies even to a missing key (records order)
            self.state.pop(url, None)
            self.last_ord[url] = ordk
            return

        vals = self._event_values(e)
        html_n = self._html_name()

        if op == "I":
            if live and self.insert_policy == "ignore_on_exists":
                return  # INSERT IGNORE: row kept, order NOT advanced
            row = {n: v for n, (_m, v) in vals.items()}  # full image resets all
            self._finish(url, row, html_changed=True)
            self.last_ord[url] = ordk
        elif op == "U":
            if live:
                row = dict(self.state[url])
                html_changed = False
                for n, (mentioned, v) in vals.items():
                    if mentioned:
                        row[n] = v
                        if n == html_n:
                            html_changed = True
                self._finish(url, row, html_changed)
                self.last_ord[url] = ordk
            elif self.update_policy == "insert_on_nonexists":
                row = {n: (v if m else None) for n, (m, v) in vals.items()}
                self._finish(url, row, html_changed=True)
                self.last_ord[url] = ordk
            # else: update on missing — dropped, order NOT advanced
        else:
            raise ValueError(op)

    def _finish(self, url: str, row: dict, html_changed: bool) -> None:
        prev = self.state.get(url)
        if html_changed:
            h = row.get(self._html_name())
            row["text"] = extract_text_bytes(bytes(h) if h is not None else None)
        else:
            row["text"] = prev.get("text") if prev else None
        row["url"] = url
        self.state[url] = row

    # ---- final state ----
    def final_rows(self) -> list[dict]:
        return [dict(r) for _u, r in sorted(self.state.items())]
