"""ldapPasswordHash (F3): vectorized numpy SHA-256 vs the Python-model
vectors, all reference hash types, reference output format."""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from hermes_spark.functions.crypto import (
    HASH_TYPES,
    _b64_rows,
    _pack_padded,
    _sha256_batch,
    ldap_password_hash,
    salt_of,
)


def test_sha256_batch_matches_hashlib():
    """Multi-block coverage: lengths straddling the 55/119-byte block
    boundaries, empty strings, and >2-block messages."""
    msgs = [
        b"", b"a", b"abc", b"x" * 54, b"x" * 55, b"x" * 56, b"x" * 63,
        b"x" * 64, b"x" * 119, b"x" * 120, b"x" * 300, "émoji ✓".encode(),
    ]
    mat, nb = _pack_padded(list(msgs), [b""] * len(msgs))
    got = _sha256_batch(mat, nb)
    for i, m in enumerate(msgs):
        assert bytes(got[i]) == hashlib.sha256(m).digest(), (i, len(m))


def test_b64_rows_matches_base64():
    for width in (1, 2, 3, 31, 32, 40):
        rng = np.random.default_rng(width)
        mat = rng.integers(0, 256, size=(7, width), dtype=np.uint8)
        got = _b64_rows(mat)
        for i in range(7):
            assert got[i] == base64.b64encode(bytes(mat[i])), (width, i)


def _model(pwd: str, hashtype: str, salt: bytes) -> str:
    algo = {
        "MD5": "md5", "SHA": "sha1", "SHA256": "sha256", "SHA384": "sha384",
        "SHA512": "sha512", "SMD5": "md5", "SSHA": "sha1",
        "SSHA256": "sha256", "SSHA384": "sha384", "SSHA512": "sha512",
    }[hashtype]
    h = hashlib.new(algo)
    h.update(pwd.encode())
    h.update(salt)
    return "{%s}%s" % (hashtype, base64.b64encode(h.digest() + salt).decode())


@pytest.mark.parametrize("hashtype", sorted(HASH_TYPES))
def test_ldap_password_hash_all_types(spark, hashtype):
    """Every reference hash type (helpers/ldaphash.py:37-83) matches
    the Python model byte-for-byte, with explicit deterministic salt."""
    _algo, saltsize = HASH_TYPES[hashtype]
    rows = [("u1", "hunter2"), ("u2", "correct horse"), ("u3", None),
            ("u4", "pässwörd✓"), ("u5", "x" * 200)]
    df = spark.createDataFrame(rows, "uid string, pw string")
    if saltsize is None:
        out = df.withColumn("h", ldap_password_hash("pw", hashtype))
        salts = {r[0]: b"" for r in rows}
    else:
        df = df.withColumn("salt", salt_of("uid", size=saltsize))
        out = df.withColumn(
            "h", ldap_password_hash("pw", hashtype, salt=F.col("salt"))
        )
        salts = {r.uid: bytes(r.salt) for r in df.collect()}
    got = {r.uid: r.h for r in out.collect()}
    for uid, pw in rows:
        if pw is None:
            assert got[uid] is None
        else:
            assert got[uid] == _model(pw, hashtype, salts[uid]), (hashtype, uid)


def test_salt_of_deterministic_and_distinct(spark):
    df = spark.createDataFrame([("a",), ("b",)], "uid string").withColumn(
        "s", salt_of("uid", size=8)
    )
    one = {r.uid: bytes(r.s) for r in df.collect()}
    two = {r.uid: bytes(r.s) for r in df.collect()}
    assert one == two
    assert one["a"] != one["b"] and all(len(v) == 8 for v in one.values())
