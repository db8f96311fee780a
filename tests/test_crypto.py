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


# -- F4: RSA-OAEP ---------------------------------------------------------


def _miller_rabin(n: int, rng) -> bool:
    if n % 2 == 0:
        return n == 2
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for _ in range(24):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = pow(x, 2, n)
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_key(bits=512, seed=7):
    import random

    rng = random.Random(seed)

    def prime():
        while True:
            p = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
            if _miller_rabin(p, rng):
                return p

    p, q = prime(), prime()
    n, e = p * q, 65537
    d = pow(e, -1, (p - 1) * (q - 1))
    return n, e, d


def test_rsa_oaep_roundtrip(spark):
    """Encrypt with the pandas-UDF public-key path, decrypt with the
    private-key path — byte-exact round trip, reference wire format
    (base64 string), deterministic under a fixed seed column."""
    from hermes_spark.functions.crypto import (
        rsa_oaep_decrypt,
        rsa_oaep_encrypt,
        salt_of,
    )

    n, e, d = _gen_key()
    rows = [("u1", "secret-1"), ("u2", "pässwörd ✓"), ("u3", None), ("u4", "")]
    df = spark.createDataFrame(rows, "uid string, v string").withColumn(
        "seed", salt_of("uid", size=16)
    )
    enc = df.withColumn("ct", rsa_oaep_encrypt("v", n, e, seed="seed"))
    out = {
        r.uid: r.pt
        for r in enc.withColumn(
            "pt", rsa_oaep_decrypt("ct", n, d)
        ).collect()
    }
    for uid, v in rows:
        assert out[uid] == v, uid
    # deterministic: same seed → same ciphertext; and ciphertexts differ
    # across rows (per-row seeds)
    cts1 = {r.uid: r.ct for r in enc.collect()}
    cts2 = {r.uid: r.ct for r in enc.collect()}
    assert cts1 == cts2
    assert cts1["u1"] != cts1["u2"]


def test_rsa_oaep_matches_model_and_rejects_long(spark):
    """The UDF output equals the pure-Python RFC 8017 model run
    locally, and over-long messages fail loudly."""
    import base64

    from hermes_spark.functions.crypto import (
        _oaep_decrypt_one,
        _oaep_encrypt_one,
        rsa_oaep_encrypt,
    )

    n, e, d = _gen_key()
    df = spark.createDataFrame([("a", "hello oaep")], "uid string, v string")
    ct = base64.b64decode(
        df.select(
            rsa_oaep_encrypt("v", n, e, seed=F.lit(b"fixed-seed")).alias("c")
        ).collect()[0].c
    )
    model = _oaep_encrypt_one(b"hello oaep", b"fixed-seed", n, e, "sha256")
    assert ct == model
    assert _oaep_decrypt_one(ct, n, d, "sha256") == b"hello oaep"

    # k=128, SHA256 → max 62 bytes; 63 must raise inside the worker
    import pytest

    long_df = spark.createDataFrame([("x" * 63,)], "v string")
    with pytest.raises(Exception, match="message too long"):
        long_df.select(
            rsa_oaep_encrypt("v", n, e, seed=F.lit(b"s")).alias("c")
        ).collect()
