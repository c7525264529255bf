"""Warehouse growth audit (VERDICT r13 Next #7): one shot that lists
every surviving table in the session catalog with its age, on-disk
footprint, ``firebolt.*`` properties, and — for ``fb_q_*`` scratch
tables — whether the owning (pid, starttime) process incarnation is
still alive. The operational counterpart of ``text_index_stats``:
that audits one index's KEY population, this audits the WAREHOUSE's
table population, so a long-lived deployment can spot leaked scratch
incarnations, stale index generations (``firebolt.appended`` stuck at
'1'), and runaway footprints without spelunking spark-warehouse/.

Usage:
    python tools/warehouse_audit.py [--json]

Scale shape: pure metadata — listTables + SHOW TBLPROPERTIES + a
filesystem walk of each table's location. No data is read; safe to
run beside live jobs (it never drops anything — pair with
``_sweep_dead_scratch`` for reaping).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the tag itself may contain underscores (fb_q_minhash_idx_<pid>_<st>,
# fb_q_shingle_idx_<pid>_<st>_sig, ...) — a non-greedy [a-z0-9_] class
# with the numeric (pid, starttime) anchors still parses unambiguously
_SCRATCH = re.compile(r"^fb_q_([a-z0-9_]+?)_(\d+)(?:_(\d+))?(_sig|_bands)?$")


def _proc_starttime(pid: int) -> int | None:
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            stat = f.read().decode("ascii", "replace")
        return int(stat.rsplit(")", 1)[1].split()[19])
    except (OSError, IndexError, ValueError):
        return None


def _dir_stats(path: str) -> tuple[int, int, float | None]:
    """(bytes, file count, newest mtime) under a table location."""
    total, files, newest = 0, 0, None
    for root, _dirs, names in os.walk(path):
        for n in names:
            try:
                st = os.stat(os.path.join(root, n))
            except OSError:
                continue
            total += st.st_size
            files += 1
            if newest is None or st.st_mtime > newest:
                newest = st.st_mtime
    return total, files, newest


def _table_location(spark, name: str) -> str | None:
    try:
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect():
            if r["col_name"] == "Location":
                loc = r["data_type"]
                if loc.startswith("file:"):
                    # file:/path or file:///path -> /path
                    loc = "/" + loc[5:].lstrip("/")
                return loc
    except Exception:
        pass
    return None


def _fb_props(spark, name: str) -> dict[str, str]:
    try:
        return {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {name}").collect()
            if r["key"].startswith("firebolt.")
        }
    except Exception:
        return {}


def audit(spark, now: float | None = None) -> list[dict]:
    """One row per catalog table: name, kind (scratch / index / table),
    owner liveness for scratch incarnations, age (h, from the newest
    data file), bytes, files, and the firebolt.* properties."""
    now = now if now is not None else time.time()
    rows: list[dict] = []
    for t in spark.catalog.listTables():
        if t.tableType == "VIEW" or t.isTemporary:
            continue
        name = t.name
        props = _fb_props(spark, name)
        loc = _table_location(spark, name)
        nbytes = nfiles = 0
        age_h = None
        if loc and os.path.isdir(loc):
            nbytes, nfiles, newest = _dir_stats(loc)
            if newest is not None:
                age_h = round((now - newest) / 3600, 2)
        row = {
            "table": name,
            "kind": "table",
            "bytes": nbytes,
            "files": nfiles,
            "age_h": age_h,
            "props": props,
        }
        m = _SCRATCH.match(name)
        if m:
            pid, st = int(m.group(2)), m.group(3)
            live_st = _proc_starttime(pid)
            owner_alive = live_st is not None and (
                st is None or int(st) == live_st
            )
            row.update(
                kind="scratch",
                owner_pid=pid,
                owner_alive=owner_alive,
            )
        elif props:
            row["kind"] = "index"
            if props.get("firebolt.appended") == "1":
                # data newer than the fingerprint artifact: the next
                # probe pays the delta until compact_*_index runs
                row["needs_compaction"] = True
        rows.append(row)
    rows.sort(key=lambda r: -r["bytes"])
    return rows


def render(rows: list[dict], as_json: bool) -> str:
    """The audit report as ONE string: machine mode is a single JSON
    line (the shape scripts and the round artifacts consume), human
    mode a largest-first table with the liveness/compaction notes.
    Factored out of main() so tests exercise the exact bytes the CLI
    prints without paying a second SparkSession."""
    if as_json:
        return json.dumps(rows)
    lines = [
        f"{'table':42} {'kind':8} {'MB':>9} {'files':>6} "
        f"{'age_h':>7}  notes"
    ]
    for r in rows:
        notes = []
        if r["kind"] == "scratch":
            notes.append(
                "owner alive" if r["owner_alive"]
                else f"ORPHAN pid={r['owner_pid']}"
            )
        if r.get("needs_compaction"):
            notes.append("needs compaction")
        notes.extend(f"{k}={v}" for k, v in r["props"].items())
        lines.append(
            f"{r['table']:42} {r['kind']:8} "
            f"{r['bytes'] / 2**20:9.2f} {r['files']:6d} "
            f"{(r['age_h'] if r['age_h'] is not None else -1):7.2f}  "
            + ", ".join(notes)
        )
    return "\n".join(lines)


def main() -> None:
    as_json = "--json" in sys.argv
    from firebolt_spark import get_spark

    spark = get_spark("warehouse-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    print(render(audit(spark), as_json))
    spark.stop()


if __name__ == "__main__":
    main()
