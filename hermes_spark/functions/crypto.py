"""F3 scalar-crypto plugin functions: LDAP password hashes as
vectorized Arrow pandas UDFs.

Reference: plugins/attributes/ldapPasswordHash/ldapPasswordHash.py:46-85
and helpers/ldaphash.py:54-115 — output format
``{TYPE}`` + base64(digest(password ‖ salt) + salt).

Scale design (the rolling_hash pattern, functions/text.py): for the
SHA-256 family the compression function itself runs COLUMN-WISE in
numpy uint32 across the whole Arrow batch — rows are packed into a
padded message-block matrix sorted by block count, so each 64-round
tier operates on a dense row prefix.  Python executes
O(112 × max_blocks) numpy steps per batch, never O(rows) interpreter
steps.  Base64 is vectorized the same way (3-byte → 4-char bit math +
a fixed-width bytes view).  The remaining legacy digests (MD5 / SHA-1 /
SHA-384 / SHA-512 families) go through hashlib's C loop per row — an
Arrow-batched compatibility path, kept for reference parity.

Determinism: the reference draws ``os.urandom`` per call
(helpers/ldaphash.py:103) — unusable in a distributed engine, where a
retried task must produce the identical row.  Salt is therefore an
explicit column; derive one with ``salt_of()`` (JVM-side sha2 prefix)
for reproducible-yet-unique per-row salts.
"""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# hashtype → (hashlib name, default salt size or None) — mirrors
# helpers/ldaphash.py:37-83 (salted sizes: min 4 max 16; defaults kept)
HASH_TYPES: dict[str, tuple[str, int | None]] = {
    "MD5": ("md5", None),
    "SHA": ("sha1", None),
    "SHA256": ("sha256", None),
    "SHA384": ("sha384", None),
    "SHA512": ("sha512", None),
    "SMD5": ("md5", 4),
    "SSHA": ("sha1", 4),
    "SSHA256": ("sha256", 8),
    "SSHA384": ("sha384", 8),
    "SSHA512": ("sha512", 8),
}


def salt_of(*cols: str | Column, size: int = 8) -> Column:
    """Deterministic per-row salt: the first ``size`` hex characters of
    sha256(concat(cols)) as ASCII bytes — JVM-side, reproducible under
    task retry.  ASCII (rather than raw digest bytes) keeps the salt a
    valid UTF-8 string, so an engine whose sha256 only accepts text
    (e.g. DuckDB) can reproduce the salted digest for value-equality
    oracles.  Any binary column works as the salt input otherwise."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.encode(
        F.substring(
            F.sha2(F.concat_ws("\x1f", *[c.cast("string") for c in cs]), 256),
            1, size,
        ),
        "utf-8",
    )


# -- vectorized SHA-256 over an Arrow batch ------------------------------

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
], dtype=np.uint32)

_H0 = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19,
], dtype=np.uint32)


def _rotr(x: np.ndarray, n: int) -> np.ndarray:
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _sha256_batch(padded: np.ndarray, nblocks: np.ndarray) -> np.ndarray:
    """SHA-256 of n pre-padded messages: ``padded`` is (n, 64*maxb)
    uint8, ``nblocks`` the per-row block count.  Returns (n, 32) uint8
    digests.  Rows are sorted by block count so each block tier
    compresses a dense prefix — the whole function is column-wise
    numpy; Python runs 48+64 vector steps per block tier."""
    n = len(nblocks)
    order = np.argsort(-nblocks, kind="stable")
    data = padded[order]
    nb_s = nblocks[order]
    H = np.tile(_H0, (n, 1))
    maxb = int(nb_s[0]) if n else 0
    for j in range(maxb):
        k = int(np.searchsorted(-nb_s, -j, side="left"))  # rows with nblocks > j
        block = data[:k, j * 64 : (j + 1) * 64].reshape(k, 16, 4).astype(np.uint32)
        W = np.zeros((k, 64), dtype=np.uint32)
        W[:, :16] = (
            (block[:, :, 0] << np.uint32(24))
            | (block[:, :, 1] << np.uint32(16))
            | (block[:, :, 2] << np.uint32(8))
            | block[:, :, 3]
        )
        for t in range(16, 64):
            w15, w2 = W[:, t - 15], W[:, t - 2]
            s0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> np.uint32(3))
            s1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> np.uint32(10))
            W[:, t] = W[:, t - 16] + s0 + W[:, t - 7] + s1
        a, b, c, d = H[:k, 0].copy(), H[:k, 1].copy(), H[:k, 2].copy(), H[:k, 3].copy()
        e, f, g, h = H[:k, 4].copy(), H[:k, 5].copy(), H[:k, 6].copy(), H[:k, 7].copy()
        for t in range(64):
            S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + S1 + ch + _K[t] + W[:, t]
            S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            t2 = S0 + maj
            h, g, f = g, f, e
            e = d + t1
            d, c, b = c, b, a
            a = t1 + t2
        for i, v in enumerate((a, b, c, d, e, f, g, h)):
            H[:k, i] += v
    out = np.zeros((n, 32), dtype=np.uint8)
    Hs = H.copy()
    be = np.stack(
        [(Hs >> np.uint32(s)) & np.uint32(0xFF) for s in (24, 16, 8, 0)], axis=2
    ).astype(np.uint8)
    out[order] = be.reshape(n, 32)
    return out


_B64_ALPHABET = np.frombuffer(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/",
    dtype=np.uint8,
)


def _b64_rows(mat: np.ndarray) -> np.ndarray:
    """Vectorized base64 of n equal-length byte rows → (n,) bytes
    objects (fixed-width 'S' view, no per-row Python)."""
    n, m = mat.shape
    pad = (-m) % 3
    if pad:
        mat = np.concatenate(
            [mat, np.zeros((n, pad), dtype=np.uint8)], axis=1
        )
    trip = mat.reshape(n, -1, 3).astype(np.uint32)
    word = (trip[:, :, 0] << 16) | (trip[:, :, 1] << 8) | trip[:, :, 2]
    idx = np.stack(
        [(word >> s) & 0x3F for s in (18, 12, 6, 0)], axis=2
    ).reshape(n, -1)
    chars = _B64_ALPHABET[idx]
    if pad:
        chars[:, -pad:] = ord("=")
    w = chars.shape[1]
    return np.ascontiguousarray(chars).view(f"S{w}").reshape(n)


def _pack_padded(pw_b: list[bytes | None], salt_b: list[bytes]) -> tuple:
    """Scatter password‖salt into a SHA-256-padded block matrix."""
    lens_p = np.array([len(p) if p is not None else 0 for p in pw_b], dtype=np.int64)
    lens_s = np.array([len(s) for s in salt_b], dtype=np.int64)
    L = lens_p + lens_s
    nblocks = (L + 9 + 63) // 64
    n = len(L)
    width = int(nblocks.max()) * 64 if n else 0
    mat = np.zeros((n, width), dtype=np.uint8)
    cat = np.frombuffer(
        b"".join((p or b"") + s for p, s in zip(pw_b, salt_b)), dtype=np.uint8
    )
    total = int(L.sum())
    row_ids = np.repeat(np.arange(n), L)
    col_ids = np.arange(total) - np.repeat(np.cumsum(L) - L, L)
    mat[row_ids, col_ids] = cat
    rows = np.arange(n)
    mat[rows, L] = 0x80
    bitlen = (L * 8).astype(np.uint64)
    end = nblocks * 64
    for i in range(8):  # 8 length bytes, big-endian
        mat[rows, end - 8 + i] = (
            (bitlen >> np.uint64(8 * (7 - i))) & np.uint64(0xFF)
        ).astype(np.uint8)
    return mat, nblocks.astype(np.int64)


def ldap_password_hash(
    password: str | Column,
    hashtype: str = "SSHA256",
    salt: str | Column | None = None,
) -> Column:
    """``{TYPE}b64(digest(pwd‖salt)+salt)`` per helpers/ldaphash.py:
    91-115.  SHA256/SSHA256 run the fully-vectorized numpy compression;
    other types use the hashlib compatibility path.  Salted types
    require an explicit binary ``salt`` column (see ``salt_of``)."""
    if hashtype not in HASH_TYPES:
        raise ValueError(
            f"invalid hashtype {hashtype!r}; valid: {sorted(HASH_TYPES)}"
        )
    algo, saltsize = HASH_TYPES[hashtype]
    if saltsize is not None and salt is None:
        raise ValueError(f"{hashtype} needs a salt column (try salt_of(...))")
    pw = F.col(password) if isinstance(password, str) else password
    sa = (
        (F.col(salt) if isinstance(salt, str) else salt)
        if salt is not None
        else F.lit(b"")
    )
    prefix = "{%s}" % hashtype

    if algo == "sha256":

        @F.pandas_udf(T.StringType())
        def _hash(pws: pd.Series, salts: pd.Series) -> pd.Series:
            mask = pws.notna()
            pw_b = [p.encode("utf-8") if isinstance(p, str) else None
                    for p in pws.tolist()]
            salt_b = [s if isinstance(s, (bytes, bytearray)) else b""
                      for s in salts.tolist()]
            if not any(m for m in mask):
                return pd.Series([None] * len(pws), dtype=object)
            mat, nblocks = _pack_padded(pw_b, salt_b)
            digests = _sha256_batch(mat, nblocks)
            slens = {len(s) for s, m in zip(salt_b, mask) if m}
            if len(slens) <= 1:
                sw = slens.pop() if slens else 0
                full = np.zeros((len(pw_b), 32 + sw), dtype=np.uint8)
                full[:, :32] = digests
                if sw:
                    sarr = np.frombuffer(
                        b"".join(s if m else b"\0" * sw
                                 for s, m in zip(salt_b, mask)),
                        dtype=np.uint8,
                    ).reshape(len(pw_b), sw)
                    full[:, 32:] = sarr
                b64 = _b64_rows(full)
                out = pd.Series(
                    [prefix + v.decode("ascii") if m else None
                     for v, m in zip(b64, mask)],
                    dtype=object,
                )
            else:  # ragged salts: per-row b64 (rare; still C-backed)
                out = pd.Series(
                    [
                        prefix
                        + base64.b64encode(bytes(d) + s).decode("ascii")
                        if m
                        else None
                        for d, s, m in zip(digests, salt_b, mask)
                    ],
                    dtype=object,
                )
            return out

        return _hash(pw, sa)

    @F.pandas_udf(T.StringType())
    def _hash_compat(pws: pd.Series, salts: pd.Series) -> pd.Series:
        # hashlib compatibility path (C digest per row) for the legacy
        # MD5/SHA-1/SHA-384/SHA-512 families
        out = []
        for p, s in zip(pws.tolist(), salts.tolist()):
            if not isinstance(p, str):
                out.append(None)
                continue
            sb = s if isinstance(s, (bytes, bytearray)) else b""
            h = hashlib.new(algo)
            h.update(p.encode("utf-8"))
            h.update(sb)
            out.append(prefix + base64.b64encode(h.digest() + bytes(sb)).decode())
        return pd.Series(out, dtype=object)

    return _hash_compat(pw, sa)


# -- F4: RSA-OAEP attribute encryption -----------------------------------
#
# Reference: plugins/attributes/crypto_RSA_OAEP/crypto_RSA_OAEP.py:60-139
# (PyCryptodome PKCS1_OAEP; encrypt → base64 string, decrypt → utf-8).
# Implemented here from RFC 8017 primitives on stdlib only: MGF1 +
# OAEP padding over hashlib, modexp over Python's C bignum pow().  The
# padding/masking is byte-level work per row; the modexp dominates and
# is a single C call per row — the same Arrow-batched compatibility
# trade as the legacy-digest path above.  The reference draws the OAEP
# seed from os.urandom; a distributed engine needs retried tasks to
# reproduce rows, so the seed is an explicit column (hashed together
# with the message to hLen bytes).  Determinism trades away OAEP's
# randomized IND-CPA property: identical (value, seed) pairs produce
# identical ciphertext, so equality of such pairs is visible across
# rows/runs.  Pass a seed column unique per (row, value-version) —
# e.g. salt_of() over the key columns PLUS a monotonically-advancing
# ts — to reduce the leak to exact-duplicate rows; the message mixing
# below guarantees a reused seed never correlates different plaintexts.

OAEP_HASHES = {
    "SHA": "sha1", "SHA224": "sha224", "SHA256": "sha256",
    "SHA384": "sha384", "SHA512": "sha512",
    "SHA3_256": "sha3_256", "SHA3_384": "sha3_384", "SHA3_512": "sha3_512",
}


def _mgf1(seed: bytes, length: int, algo: str) -> bytes:
    out = b""
    for i in range((length + hashlib.new(algo).digest_size - 1)
                   // hashlib.new(algo).digest_size):
        out += hashlib.new(algo, seed + i.to_bytes(4, "big")).digest()
    return out[:length]


def _xor(a: bytes, b: bytes) -> bytes:
    return (
        int.from_bytes(a, "big") ^ int.from_bytes(b, "big")
    ).to_bytes(len(a), "big")


def _oaep_encrypt_one(msg: bytes, seed_material: bytes, n: int, e: int,
                      algo: str) -> bytes:
    k = (n.bit_length() + 7) // 8
    h = hashlib.new(algo)
    hlen = h.digest_size
    if len(msg) > k - 2 * hlen - 2:
        raise ValueError(f"message too long for the key ({len(msg)} bytes)")
    lhash = hashlib.new(algo, b"").digest()
    ps = b"\x00" * (k - len(msg) - 2 * hlen - 2)
    db = lhash + ps + b"\x01" + msg
    # the message is MIXED into the seed derivation: equal seed columns
    # with different plaintexts never produce correlated masks, so a
    # reused/constant seed column only ever leaks exact-duplicate
    # (value, seed) rows — not plaintext equality classes across values
    seed = hashlib.new(algo, seed_material + b"\x00" + msg).digest()[:hlen]
    masked_db = _xor(db, _mgf1(seed, k - hlen - 1, algo))
    masked_seed = _xor(seed, _mgf1(masked_db, hlen, algo))
    em = b"\x00" + masked_seed + masked_db
    return pow(int.from_bytes(em, "big"), e, n).to_bytes(k, "big")


def _oaep_decrypt_one(ct: bytes, n: int, d: int, algo: str) -> bytes:
    k = (n.bit_length() + 7) // 8
    hlen = hashlib.new(algo).digest_size
    em = pow(int.from_bytes(ct, "big"), d, n).to_bytes(k, "big")
    masked_seed, masked_db = em[1 : 1 + hlen], em[1 + hlen :]
    seed = _xor(masked_seed, _mgf1(masked_db, hlen, algo))
    db = _xor(masked_db, _mgf1(seed, k - hlen - 1, algo))
    lhash = hashlib.new(algo, b"").digest()
    if em[0] != 0 or db[:hlen] != lhash:
        raise ValueError("OAEP decryption error")
    i = db.index(b"\x01", hlen)
    return db[i + 1 :]


def rsa_oaep_encrypt(
    value: str | Column,
    n: int,
    e: int,
    seed: str | Column,
    hash_name: str = "SHA256",
) -> Column:
    """Encrypt a string/binary column with an RSA public key (OAEP,
    RFC 8017) → base64 string, the reference plugin's wire format."""
    if hash_name not in OAEP_HASHES:
        raise ValueError(f"unknown OAEP hash {hash_name!r}")
    algo = OAEP_HASHES[hash_name]
    v = F.col(value) if isinstance(value, str) else value
    s = F.col(seed) if isinstance(seed, str) else seed

    @F.pandas_udf(T.StringType())
    def _enc(vals: pd.Series, seeds: pd.Series) -> pd.Series:
        out = []
        for m, sd in zip(vals.tolist(), seeds.tolist()):
            if m is None:
                out.append(None)
                continue
            mb = m if isinstance(m, (bytes, bytearray)) else str(m).encode()
            sb = sd if isinstance(sd, (bytes, bytearray)) else str(sd).encode()
            out.append(
                base64.b64encode(
                    _oaep_encrypt_one(bytes(mb), bytes(sb), n, e, algo)
                ).decode("ascii")
            )
        return pd.Series(out, dtype=object)

    return _enc(v, s)


def rsa_oaep_decrypt(
    value: str | Column, n: int, d: int, hash_name: str = "SHA256"
) -> Column:
    """Decrypt base64/binary ciphertext with the private exponent →
    utf-8 string (the reference's private-key direction)."""
    if hash_name not in OAEP_HASHES:
        raise ValueError(f"unknown OAEP hash {hash_name!r}")
    algo = OAEP_HASHES[hash_name]
    v = F.col(value) if isinstance(value, str) else value

    @F.pandas_udf(T.StringType())
    def _dec(vals: pd.Series) -> pd.Series:
        out = []
        for c in vals.tolist():
            if c is None:
                out.append(None)
                continue
            cb = c if isinstance(c, (bytes, bytearray)) else base64.b64decode(c)
            out.append(_oaep_decrypt_one(bytes(cb), n, d, algo).decode("utf-8"))
        return pd.Series(out, dtype=object)

    return _dec(v)
