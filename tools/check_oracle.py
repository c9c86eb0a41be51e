#!/usr/bin/env python3
"""Dev-only local mimic of the driver's t2 correctness gate.

Runs DuckDB over the oracle SQL dumped by graft.Verify and compares
row-count / schema / values against the Spark parquet output.
Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Fuzz mode (round-3 verdict item #8) — generate N seeded arbitrary-
Unicode strings, evaluate every native graft hash expression over
them via the graft.Fuzz main, recompute the same values INDEPENDENTLY
in DuckDB SQL, and compare value-by-value:
Usage: python3 tools/check_oracle.py --fuzz N [workDir]
"""
import json
import random
import subprocess
import sys

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_bad += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        got, want = norm(got), norm(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1
            continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            if str(a.dtype) != str(b.dtype):
                mismatch = f"dtype[{c}] {a.dtype} vs {b.dtype}"
                break
            if not a.equals(b):
                bad = (a != b) & ~(a.isna() & b.isna())
                i = bad.idxmax()
                mismatch = f"value[{c}] row {i}: {a[i]!r} vs {b[i]!r} ({int(bad.sum())} diffs)"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    print(f"--- {len(oracle) - n_bad}/{len(oracle)} passed")
    return 1 if n_bad else 0


def gen_strings(n: int) -> list:
    """Seeded arbitrary-Unicode strings mirroring HashPropertySpec's
    generator classes: ASCII alnum tokens, Latin-1 triples, CJK
    triples, astral-plane emoji pairs; 0-8 tokens joined by single or
    double spaces with optional leading/trailing space. Deterministic
    for a given N (Mersenne Twister is stable across Python versions)."""
    rng = random.Random(20260812)
    alnum = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

    def token():
        k = rng.randrange(4)
        if k == 0:
            return "".join(rng.choice(alnum) for _ in range(rng.randrange(1, 9)))
        if k == 1:
            return "".join(chr(rng.randrange(0x00E0, 0x0100)) for _ in range(3))
        if k == 2:
            return "".join(chr(rng.randrange(0x4E00, 0xA000)) for _ in range(3))
        return "".join(chr(rng.randrange(0x1F300, 0x1F650)) for _ in range(2))

    out = []
    for i in range(n):
        # pin every 10th string to the short-token domain so the
        # <3-token null contract of the minhash signature is always
        # exercised regardless of N
        ntok = rng.randrange(0, 3) if i % 10 == 0 else rng.randrange(0, 9)
        sep = rng.choice([" ", "  "])
        s = (rng.choice(["", " "]) + sep.join(token() for _ in range(ntok))
             + rng.choice(["", " "]))
        out.append(s)
    return out


# Independent DuckDB recomputation of graft.Fuzz's columns. Mirrors the
# published constants (p=1e9+7, shingle mult 37, perm family
# (103515239+2q, 12345+q)) — NOT the Spark code: ascii(substring) is
# DuckDB's own code-point machinery, so a decode/tokenize divergence
# between the engines surfaces as a value diff.
FUZZ_SQL = """
WITH th AS (
  SELECT id, s, list_transform(string_split(s, ' '), t ->
    list_reduce(list_prepend(0::BIGINT,
      list_transform(range(1, length(t)+1), i -> ascii(substring(t,i,1))::BIGINT)),
      (a,c) -> (a*31+c) % 1000000007)) AS th
  FROM fuzz_input),
sh AS (
  SELECT id, s, th, list_transform(range(1, len(th)-1),
    i -> (((th[i]*37 + th[i+1]) % 1000000007) * 37 + th[i+2]) % 1000000007) AS hs
  FROM th),
scalar AS (
  SELECT id,
    list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(s)+1),
      i -> ascii(substring(s,i,1))::BIGINT)), (a,c) -> (a*31+c) % 1000000007) AS poly_fp,
    list_reduce(list_prepend(0::BIGINT, th), (a,c) -> (a*31+c) % 1000000007) AS token_fold,
    CASE WHEN len(th) < 3 THEN -1 ELSE
      list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 16), q ->
        list_aggregate(list_transform(hs,
          x -> (x*((103515239 + 2*q) % 1000000007) + (12345 + q)) % 1000000007),
          'min'))), (a,c) -> (a*31+c) % 1000000007)
    END AS sig_fp,
    list_reduce(list_prepend(0::BIGINT,
      list_transform(list_transform(range(1, greatest(length(s)-1, 1)),
        i -> substring(s, i, 3)), g ->
        list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(g)+1),
          i -> ascii(substring(g,i,1))::BIGINT)), (a,c) -> (a*31+c) % 1000000007))),
      (a,c) -> (a*31+c) % 1000000007) AS ngram_fp,
    list_reduce(list_prepend(0::BIGINT, list_transform(
      range(1, length(trim(regexp_replace(regexp_replace(lower(s),
        '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) + 1),
      i -> ascii(substring(trim(regexp_replace(regexp_replace(lower(s),
        '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), i, 1))::BIGINT)),
      (a,c) -> (a*31+c) % 1000000007) AS canon_fp
  FROM sh),
bits AS (
  SELECT id, b, CAST(power(2, b) AS BIGINT) AS pow2,
         sum(CASE WHEN (h & CAST(power(2, b) AS BIGINT)) != 0 THEN 1 ELSE -1 END) AS bal
  FROM (SELECT id, unnest(th) AS h FROM th), (SELECT unnest(range(30)) AS b)
  GROUP BY 1, 2, 3),
sim AS (
  SELECT id, CAST(sum(CASE WHEN bal > 0 THEN pow2 ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY id),
-- byte distance == code-point distance iff both strings are pure
-- ASCII (strlen == length); outside that domain emit the -1 sentinel
-- (the CJK domain is oracle-pinned by cjk_edit_sim)
lev AS (
  SELECT a.id,
         CASE WHEN strlen(a.s) = length(a.s) AND strlen(b.s) = length(b.s)
              THEN levenshtein(a.s, b.s) ELSE -1 END AS lev_next
  FROM fuzz_input a LEFT JOIN fuzz_input b ON b.id = a.id + 1),
lev2 AS (SELECT id, coalesce(lev_next, -1)::BIGINT AS lev_next FROM lev)
SELECT s.id, poly_fp, token_fold, sig_fp, simhash, ngram_fp, canon_fp, lev_next
FROM scalar s JOIN sim USING (id) JOIN lev2 USING (id) ORDER BY s.id
"""


def fuzz(n: int, work_dir: str) -> int:
    import os
    os.makedirs(work_dir, exist_ok=True)
    strings = gen_strings(n)
    inp = f"{work_dir}/fuzz_input.parquet"
    pd.DataFrame({"id": range(n), "s": strings}).to_parquet(inp)
    print(f"fuzz: {n} seeded strings -> {inp}; running graft.Fuzz ...")
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Fuzz {inp} {work_dir}"],
        capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(f"FAIL fuzz: graft.Fuzz exited {r.returncode}")
        return 1
    got = norm(pq.read_table(f"{work_dir}/fuzz_hashes").to_pandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW fuzz_input AS SELECT * FROM '{inp}'")
    want = norm(con.sql(FUZZ_SQL).df())
    n_bad = 0
    for c in got.columns:
        a, b = got[c].astype("int64"), want[c].astype("int64")
        if a.equals(b):
            print(f"OK   fuzz[{c}]: {n} values agree")
        else:
            bad = a != b
            i = bad.idxmax()
            print(f"FAIL fuzz[{c}] row {i} ({strings[i]!r}): "
                  f"{a[i]} vs {b[i]} ({int(bad.sum())} diffs)")
            n_bad += 1
    print(f"--- fuzz {len(got.columns) - n_bad}/{len(got.columns)} columns agree over {n} strings")
    return 1 if n_bad else 0


if __name__ == "__main__":
    if sys.argv[1] == "--fuzz":
        sys.exit(fuzz(int(sys.argv[2]),
                      sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_fuzz"))
    sys.exit(main(sys.argv[1], sys.argv[2]))
