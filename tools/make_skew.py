#!/usr/bin/env python3
"""Derive a HOT-KEY variant of a rehearsal dataset (driver-side tooling,
like make_sf.py — not part of the Spark library).

The 10x replica from make_sf.py scales volume but keeps keys roughly
uniform; real corpora don't — one bot user, one mirror supplier, one
default account routinely owns a double-digit share of rows. This tool
plants exactly that regime so the skew-handling operators can be
MEASURED against their plain twins instead of merely proven equivalent:

  events    user_id -> 1 for every row with event_id % 5 == 0
            (deterministic ~20% of rows): one user now owns 20% of a
            13.5M-row table — the as-of join's per-user window sort
            and any user-keyed shuffle get a genuine straggler.
  lineitem  l_suppkey -> 1 for every row with l_orderkey % 5 == 0:
            one supplier owns ~20% of the fact table — the skewed
            shuffle-join regime Salting.saltedJoin exists for.

Everything else is copied untouched. Usage:
    python3 tools/make_skew.py [SRCDIR] [OUTDIR] [EVENTS_REP] [EVENTS_HOT_DIV]
    defaults: /tmp/testdata/sf1.0 /tmp/testdata/sf1.0skew 1 5

EVENTS_REP > 1 additionally replicates the (already skewed) events
table that many times — event_id offset per replica, ts shifted k days,
user ids KEPT so the hot user still owns its share of the grown table.
EVENTS_HOT_DIV sets that share (event_id % DIV == 0 -> hot): 5 = 20%,
2 = 50%. The as-of join's per-user straggler needs the hot user's
single-task window sort to EXCEED the other 31 threads' combined slack
before wall time shows it; at local[32] that takes ~50% of a ~20M-row
table (one bot account owning half an event stream is a real regime).
"""
import sys
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf1.0"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata/sf1.0skew"
rep = int(sys.argv[3]) if len(sys.argv) > 3 else 1
hot_div = int(sys.argv[4]) if len(sys.argv) > 4 else 5

import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

con.execute(f"""
COPY (
  SELECT e.event_id + k.k * 100000000 AS event_id,
         e.ts + INTERVAL (k.k) DAY AS ts,
         CASE WHEN e.event_id % {hot_div} = 0 THEN 1 ELSE e.user_id END
           AS user_id,
         e.event_type, e.value, e.props
  FROM read_parquet('{src}/events.parquet') e, range({rep}) k(k)
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")
n = con.execute(
    f"SELECT count(*) FILTER (user_id = 1), count(*) "
    f"FROM read_parquet('{out}/events.parquet')").fetchone()
print(f"events: hot user owns {n[0]}/{n[1]} rows ({100*n[0]/n[1]:.1f}%)")

con.execute(f"""
COPY (
  SELECT * REPLACE (
    CASE WHEN l_orderkey % 5 = 0 THEN 1 ELSE l_suppkey END AS l_suppkey)
  FROM read_parquet('{src}/lineitem.parquet')
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
""")
n = con.execute(
    f"SELECT count(*) FILTER (l_suppkey = 1), count(*) "
    f"FROM read_parquet('{out}/lineitem.parquet')").fetchone()
print(f"lineitem: hot supplier owns {n[0]}/{n[1]} rows ({100*n[0]/n[1]:.1f}%)")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "documents", "embeddings"]:
    con.execute(f"""
      COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))
      TO '{out}/{t}.parquet' (FORMAT PARQUET)""")
print(f"dims + remaining tables copied to {out}")
