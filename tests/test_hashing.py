"""poly_hash_u64: the SQL-reproducible string hash that fingerprints,
minhash and simhash are defined over.  Pins the numpy buffer math to a
scalar pure-python reference (Σ byte_j·B^j mod 2^64 → splitmix64) and
to the DuckDB HUGEINT twin used by the oracles."""

import duckdb
import numpy as np
import pyarrow as pa

from searchengine_ray.functions.hashing import poly_hash_u64, splitmix64


def _ref(s: str) -> int:
    B, M = 0x100000001B3, (1 << 64) - 1
    h, p = 0, 1
    for byte in s.encode("utf-8"):
        h = (h + byte * p) & M
        p = (p * B) & M
    return int(splitmix64(np.array([h], dtype=np.uint64))[0])


CASES = ["", "a", "hello", "héllo wörld", "the quick brown fox", "0" * 300,
         "a b c", "\n\t", "ZZ top", "émoji 🎉 bytes"]


def test_poly_hash_matches_scalar_reference():
    out = poly_hash_u64(CASES)
    for i, s in enumerate(CASES):
        assert int(out[i]) == _ref(s), s


def test_poly_hash_arrow_and_sliced_inputs():
    arr = pa.array(["pad"] + CASES, pa.string())
    assert (poly_hash_u64(arr.slice(1)) == poly_hash_u64(CASES)).all()
    big = pa.array(CASES, pa.large_string())
    assert (poly_hash_u64(big) == poly_hash_u64(CASES)).all()


def test_poly_hash_matches_duckdb_hugeint_twin():
    """The oracle-side byte-list Horner (reversed list, AND-masked
    HUGEINT) must agree — this is the contract the minhash/simhash/
    fingerprint oracles stand on."""
    con = duckdb.connect()
    con.register("t", pa.table({"s": pa.array(CASES, pa.string())}))
    rows = con.execute("""
        WITH b AS (SELECT s, hex(encode(s)) AS hx,
                          octet_length(encode(s)) AS n FROM t),
        h0 AS (SELECT s, CASE WHEN n = 0 THEN 0::HUGEINT ELSE
                 list_reduce(list_reverse(
                   list_transform(range(1, n + 1),
                     i -> CAST(strpos('123456789ABCDEF',
                                      substring(hx, CAST(2*i-1 AS BIGINT), 1)) * 16
                             + strpos('123456789ABCDEF',
                                      substring(hx, CAST(2*i AS BIGINT), 1)) AS HUGEINT))),
                   (acc, x) -> (acc * 1099511628211::HUGEINT + x)
                               & 18446744073709551615::HUGEINT) END AS h
               FROM b),
        m1 AS (SELECT s, (h + 11400714819323198485::HUGEINT)
                         & 18446744073709551615::HUGEINT AS z FROM h0),
        m2 AS (SELECT s, xor(z, z >> 30) AS z FROM m1),
        m3 AS (SELECT s, ((z & 4294967295::HUGEINT) * 13787848793156543929::HUGEINT
                  + (((z >> 32) * 13787848793156543929::HUGEINT)
                     & 4294967295::HUGEINT) * 4294967296::HUGEINT)
                 & 18446744073709551615::HUGEINT AS z FROM m2),
        m4 AS (SELECT s, xor(z, z >> 27) AS z FROM m3),
        m5 AS (SELECT s, ((z & 4294967295::HUGEINT) * 10723151780598845931::HUGEINT
                  + (((z >> 32) * 10723151780598845931::HUGEINT)
                     & 4294967295::HUGEINT) * 4294967296::HUGEINT)
                 & 18446744073709551615::HUGEINT AS z FROM m4)
        SELECT s, xor(z, z >> 31) AS z FROM m5
    """).fetchall()
    got = {s: int(z) for s, z in rows}
    eng = poly_hash_u64(CASES)
    for i, s in enumerate(CASES):
        assert got[s] == int(eng[i]), s
