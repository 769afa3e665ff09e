"""Write policies — the reference's DML conflict-handling surface.

Mirrors WritePolicyEnum (reference:
connectors-common/sql-core/src/main/java/io/tapdata/common/dml/WritePolicyEnum.java:3-11)
and the default resolution in MysqlConnector.java:478-485:

  insert policy ∈ {update_on_exists (default), ignore_on_exists, just_insert}
  update policy ∈ {ignore_on_nonexists (default), insert_on_nonexists, log_on_nonexists}

In this engine a policy pair selects the MERGE clause shape applied per key
after the last-writer-wins fold (SURVEY.md §2.8):

  update_on_exists   -> WHEN MATCHED THEN UPDATE + WHEN NOT MATCHED THEN INSERT
  ignore_on_exists   -> WHEN NOT MATCHED THEN INSERT only
  just_insert        -> treated as update_on_exists (a COW lake table has a
                        key invariant; a blind append would corrupt it — the
                        reference's just_insert relies on the DB raising a
                        duplicate-key error, which has no lake analog)
  ignore_on_nonexists -> WHEN MATCHED THEN UPDATE only
  insert_on_nonexists -> update folded image inserted when key absent
  log_on_nonexists    -> like ignore, plus a counted metric
"""

from __future__ import annotations

from dataclasses import dataclass

INSERT_POLICIES = {"update_on_exists", "ignore_on_exists", "just_insert"}
UPDATE_POLICIES = {"ignore_on_nonexists", "insert_on_nonexists", "log_on_nonexists"}


@dataclass(frozen=True)
class WritePolicy:
    insert_policy: str = "update_on_exists"
    update_policy: str = "ignore_on_nonexists"

    def __post_init__(self) -> None:
        if self.insert_policy not in INSERT_POLICIES:
            raise ValueError(f"bad insert policy: {self.insert_policy}")
        if self.update_policy not in UPDATE_POLICIES:
            raise ValueError(f"bad update policy: {self.update_policy}")

    @property
    def insert_updates_existing(self) -> bool:
        return self.insert_policy in ("update_on_exists", "just_insert")

    @property
    def update_inserts_missing(self) -> bool:
        return self.update_policy == "insert_on_nonexists"


DEFAULT_POLICY = WritePolicy()
