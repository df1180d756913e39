"""Snapshot-keyed SELECT result cache for the serving engine.

The reference topology puts a BI tool (Superset) in front of the Thrift
server — dashboard workloads re-issue identical SELECTs far more often
than the warehouse commits. This cache serves those repeats without
touching the executors, with CORRECTNESS guaranteed by construction
rather than by TTL guesswork:

- **Key** = (statement text, catalog fingerprint). The fingerprint
  hashes every table's ``version-hint.text`` (the metacat commit
  pointer, monotone per commit) plus ``views.json`` — ANY commit to any
  table changes the fingerprint, so a hit can only serve results
  computed against the exact current warehouse state. No invalidation
  hooks, no staleness window: commits rotate the key space and old
  entries age out of the LRU.
- **Eligibility** is conservative, decided per statement and session:
  only SELECT/WITH statements; never in a session that has created temp
  views, SET conf/variables, changed database, or run EXECUTE IMMEDIATE
  (any of those makes results session-dependent — the session is
  permanently "tainted" for caching); never for statements using
  volatile functions (rand/uuid/current_timestamp/...).
- **Bounded**: results at most ``max_rows`` rows are stored (bigger
  result sets are negative-cached so they aren't re-probed), at most
  ``max_entries`` statements LRU-held. Hits materialize as a local
  DataFrame — schema-preserving, zero cluster work.

At 100 TB the fingerprint walk is O(#tables) tiny metadata reads —
independent of data size — and the cache holds only dashboard-sized
results, never scans.
"""

from __future__ import annotations

import hashlib
import os
import re
import threading
from collections import OrderedDict

_SELECT_RE = re.compile(r"^\s*(SELECT|WITH)\b", re.IGNORECASE)

# statement classes that make a session's future SELECT results depend on
# session-local state — once seen, the session never uses the cache again
_TAINT_RE = re.compile(
    r"^\s*(SET|DECLARE|USE|EXECUTE\s+IMMEDIATE|CACHE|UNCACHE"
    r"|CREATE\s+(OR\s+REPLACE\s+)?(GLOBAL\s+)?TEMP(ORARY)?\s)",
    re.IGNORECASE,
)

_VOLATILE_RE = re.compile(
    r"\b(rand|randn|random|uuid|shuffle|current_timestamp|current_date"
    r"|current_timezone|now|localtimestamp|unix_timestamp|session_user"
    r"|monotonically_increasing_id|spark_partition_id|input_file_name"
    # global temp views are CROSS-session state the catalog fingerprint
    # does not cover — reads of them must never be cached
    r"|global_temp)\b",
    re.IGNORECASE,
)

# statements that mutate state SHARED BY ALL sessions outside the
# warehouse (global temp views; non-temporary function definitions):
# the catalog fingerprint cannot see these, so the whole cache must
# flush — tainting only the issuing session would leave other sessions
# reading stale entries
_GLOBAL_MUTATION_RE = re.compile(
    r"^\s*(CREATE\s+(OR\s+REPLACE\s+)?GLOBAL\s+TEMP(ORARY)?\s"
    r"|CREATE\s+(OR\s+REPLACE\s+)?FUNCTION\b"
    r"|DROP\s+FUNCTION\b"
    r"|DROP\s+VIEW\s+global_temp\.)",
    re.IGNORECASE,
)


def is_cacheable_statement(statement: str) -> bool:
    return bool(_SELECT_RE.match(statement)) and not _VOLATILE_RE.search(statement)


def is_tainting_statement(statement: str) -> bool:
    return bool(_TAINT_RE.match(statement))


def is_global_mutation(statement: str) -> bool:
    return bool(_GLOBAL_MUTATION_RE.match(statement))


def catalog_fingerprint(warehouse: str) -> str:
    """Hash of every table's commit pointer + the view registry.

    version-hint.text is metacat's atomically-swapped pointer (one tiny
    read per table); views.json is the warehouse-level view registry.
    Any commit anywhere changes this value.
    """
    h = hashlib.sha256()
    if os.path.isdir(warehouse):
        for ns in sorted(os.listdir(warehouse)):
            ns_dir = os.path.join(warehouse, ns)
            if not os.path.isdir(ns_dir):
                continue
            for tbl in sorted(os.listdir(ns_dir)):
                hint = os.path.join(ns_dir, tbl, "metadata", "version-hint.text")
                try:
                    with open(hint, "rb") as fh:
                        h.update(f"{ns}.{tbl}=".encode() + fh.read() + b";")
                except OSError:
                    continue
    views = os.path.join(warehouse, "views.json")
    try:
        with open(views, "rb") as fh:
            h.update(b"views=" + fh.read())
    except OSError:
        pass
    return h.hexdigest()


class _TooBig:
    """Negative-cache marker: this statement's result exceeds max_rows
    at this fingerprint — don't re-probe (re-probing would re-pay a
    partial materialization on every repeat)."""


TOO_BIG = _TooBig()


class ResultCache:
    def __init__(self, max_entries: int = 128, max_rows: int = 10_000):
        self.max_entries = max_entries
        self.max_rows = max_rows
        self._lru: OrderedDict[tuple[str, str], object] = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def _key(self, statement: str, fingerprint: str) -> tuple[str, str]:
        return (" ".join(statement.split()), fingerprint)

    def lookup(self, statement: str, fingerprint: str):
        """→ (schema, rows) on hit, TOO_BIG, or None on miss."""
        key = self._key(statement, fingerprint)
        with self._lock:
            if key in self._lru:
                self._lru.move_to_end(key)
                self.hits += 1
                return self._lru[key]
            self.misses += 1
            return None

    def store(self, statement: str, fingerprint: str, value) -> None:
        key = self._key(statement, fingerprint)
        with self._lock:
            self._lru[key] = value
            self._lru.move_to_end(key)
            while len(self._lru) > self.max_entries:
                self._lru.popitem(last=False)

    def clear(self) -> None:
        """Flush everything — issued when cross-session state outside the
        catalog fingerprint changes (global temp views, functions)."""
        with self._lock:
            self._lru.clear()
