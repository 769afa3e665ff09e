"""Independent single-threaded CDC replay oracle.

A plain-Python re-implementation of the reference's apply semantics
(NormalWriteRecorder: upsert-on-PK / partial update / delete-by-PK, applied
in source order per key — SURVEY.md §5 test plan), used to check the Spark
engine's final table state. Deliberately shares NO code with the engine
except the text-extraction pure function (which is the contract under test
in F12: byte-identical text per url).

Semantics mirrored (documented in operators/dedup.py and lake/merge.py):
- events of one (epoch, ddl-slice) batch apply per key in
  (warc_ts, event_seq) order;
- insert = full row image (resets all payload columns);
- update = partial image: null column means unchanged; explicit nulling
  via removed_fields;
- delete tombstones the key (records its order, payload gone);
- an applied batch only modifies a row if its final order is strictly
  newer than the row's last applied order (redelivery guard);
- write policies: insert {update_on_exists | ignore_on_exists},
  update {ignore_on_nonexists | insert_on_nonexists};
- DDL events are barriers: ADD/RENAME/WIDEN applied in order between
  slices.
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
    return val


@dataclass
class OracleReplayer:
    insert_policy: str = "update_on_exists"
    update_policy: str = "ignore_on_nonexists"
    # logical schema: ordered (name, type); starts at the pages shape
    columns: list[tuple[str, str]] = field(
        default_factory=lambda: [
            ("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
            ("text", "string"), ("lang", "string"),
        ]
    )
    state: dict[str, dict] = field(default_factory=dict)
    last_ord: dict[str, tuple] = field(default_factory=dict)
    deleted: dict[str, bool] = field(default_factory=dict)

    # ---- schema evolution (between slices) ----
    def apply_ddl(self, kind: str, column: str, new_name=None, new_type=None):
        names = [c[0] for c in self.columns]
        if kind == "ADD_COLUMN":
            assert column not in names
            self.columns.append((column, new_type))
            for row in self.state.values():
                row.setdefault(column, None)
        elif kind == "RENAME_COLUMN":
            i = names.index(column)
            self.columns[i] = (new_name, self.columns[i][1])
            for row in self.state.values():
                row[new_name] = row.pop(column, None)
        elif kind == "TYPE_WIDEN":
            i = names.index(column)
            self.columns[i] = (column, new_type)
        else:
            raise ValueError(kind)

    # ---- one batch (epoch slice) ----
    def apply_slice(self, events: list[dict]) -> None:
        """events: dicts with keys op,url,warc_ts,event_seq,after,
        removed_fields,extras (after as dict or None)."""
        payload = [(n, t) for n, t in self.columns if n not in ("url", "text")]
        by_key: dict[str, list[dict]] = {}
        for e in events:
            by_key.setdefault(e["url"], []).append(e)

        for url, evs in by_key.items():
            evs.sort(key=lambda e: (e["warc_ts"], e["event_seq"]))
            # fold (mirrors lww_fold semantics independently)
            folded: dict[str, Any] = {}
            set_flags: dict[str, bool] = {n: False for n, _ in payload}
            set_ord: dict[str, tuple] = {}
            last_del = None
            last_ins = None
            last_op = None
            final_ord = None
            for e in evs:
                o = (e["warc_ts"], e["event_seq"])
                if final_ord is not None and o == final_ord:
                    continue  # exact duplicate delivery
                final_ord = o
                last_op = e["op"]
                if e["op"] == "D":
                    last_del = o
                    continue
                if e["op"] == "I":
                    last_ins = o
                after = e.get("after") or {}
                extras = e.get("extras") or {}
                removed = set(e.get("removed_fields") or [])
                for n, ty in payload:
                    base = n in ("warc_ts", "html", "lang") or n in after
                    if n in removed:
                        folded[n] = None
                        set_flags[n] = True
                        set_ord[n] = o
                    elif e["op"] == "I":
                        v = after.get(n) if base else _cast(extras.get(n), ty)
                        folded[n] = v
                        set_flags[n] = True
                        set_ord[n] = o
                    else:  # partial update
                        if base and after.get(n) is not None:
                            folded[n] = after[n]
                            set_flags[n] = True
                            set_ord[n] = o
                        elif not base and n in extras:
                            folded[n] = _cast(extras[n], ty)
                            set_flags[n] = True
                            set_ord[n] = o
            # delete resets anything set before the last delete
            if last_del is not None:
                for n in list(set_flags):
                    if set_flags[n] and set_ord.get(n, (None,)) < last_del:
                        set_flags[n] = False
                        folded[n] = None
            if last_op == "D":
                final_op = "D"
            elif last_ins is not None and (last_del is None or last_ins >= last_del):
                final_op = "I"
            else:
                final_op = "U"

            # ---- apply with redelivery guard + policies ----
            prev_ord = self.last_ord.get(url)
            if prev_ord is not None and final_ord <= prev_ord:
                continue  # stale
            live = url in self.state and not self.deleted.get(url, False)
            exists = url in self.last_ord

            if final_op == "D":
                self.state.pop(url, None)
                self.deleted[url] = True
                self.last_ord[url] = final_ord
            elif final_op == "I":
                if live and self.insert_policy == "ignore_on_exists":
                    continue
                row = {n: (folded.get(n) if set_flags.get(n) else None) for n, _ in payload}
                self._finish_row(url, row, html_changed=True)
                self.deleted[url] = False
                self.last_ord[url] = final_ord
            else:  # 'U'
                if live:
                    row = dict(self.state[url])
                    html_changed = False
                    for n, _ in payload:
                        if set_flags.get(n):
                            row[n] = folded.get(n)
                            if n == self._html_name():
                                html_changed = True
                    self._finish_row(url, row, html_changed=html_changed)
                    self.last_ord[url] = final_ord
                elif self.update_policy == "insert_on_nonexists":
                    row = {n: (folded.get(n) if set_flags.get(n) else None) for n, _ in payload}
                    self._finish_row(url, row, html_changed=True)
                    self.deleted[url] = False
                    self.last_ord[url] = final_ord
                elif exists:
                    continue  # tombstone stays
                # else: update on missing — ignored entirely

    def _html_name(self) -> str:
        # html is the 3rd created field; renames tracked positionally
        return self.columns[2][0]

    def _finish_row(self, url: str, row: dict, html_changed: bool) -> None:
        prev = self.state.get(url)
        if html_changed:
            row["text"] = extract_text_bytes(row.get(self._html_name()))
        else:
            row["text"] = prev.get("text") if prev else None
        row["url"] = url
        self.state[url] = row

    # ---- final state ----
    def final_rows(self) -> list[dict]:
        return [dict(r) for u, r in sorted(self.state.items())]
