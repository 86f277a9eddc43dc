"""AES-256-CFB payload decryption — loader-level twin of the reference's
encrypted-input support (`.enc` suffix, railgun/util/DecryptBytes.go:17-41,
key derivation railgun/util/CreateCipher.go:19-34):

  key = argon2(passphrase, salt=hex-decoded salt, 32 bytes)
  ciphertext = IV (16 bytes) || CFB stream

The reference's KDF (CreateCipher.go:26, Go `argon2.Key`) is **Argon2i**
with time=3, memory=32 MiB, lanes=4, keyLen=32. KDF selection here is
explicit — see `derive_key` — because a silently-substituted KDF decrypts
Go-railgun payloads into garbage bytes. Argon2i itself comes from
`cryptography`>=48 (OpenSSL's RFC 9106 implementation; validated against
the published §5.2 Argon2i test vector in tests) with argon2-cffi as a
fallback backend — Go's x/crypto/argon2 passes the same RFC vectors, so
derivation is byte-for-byte identical to the reference.

Decryption happens at the loader (driver or a mapInPandas over
binaryFile), never as a column type — matching the reference, where
decryption wraps the byte stream before deserialization
(railgun/cli/process.go:892-895)."""

from __future__ import annotations

_KDFS = ("auto", "argon2i", "argon2id")


def _argon2i_go_params(passphrase: str, salt: bytes) -> bytes:
    """Argon2i with the reference's exact parameter set —
    `argon2.Key(passphrase, salt, 3, 32*1024, 4, 32)` (CreateCipher.go:26).
    Backends in preference order: `cryptography`>=48 (OpenSSL RFC 9106),
    argon2-cffi. Both pass the published RFC 9106 §5.2 Argon2i vector (as
    does Go's x/crypto/argon2), so output is byte-for-byte Go-identical.
    Raises ImportError when neither backend exists."""
    try:
        from cryptography.exceptions import UnsupportedAlgorithm
        from cryptography.hazmat.primitives.kdf.argon2 import Argon2i

        try:
            return Argon2i(
                salt=salt, length=32, iterations=3, lanes=4, memory_cost=32 * 1024
            ).derive(passphrase.encode())
        except UnsupportedAlgorithm:
            # cryptography>=48 built against OpenSSL<3.2 imports fine but
            # cannot provide the Argon2 EVP_KDF — fall through to argon2-cffi
            pass
    except ImportError:
        pass
    from argon2.low_level import Type, hash_secret_raw  # type: ignore

    return hash_secret_raw(
        secret=passphrase.encode(),
        salt=salt,
        time_cost=3,
        memory_cost=32 * 1024,
        parallelism=4,
        hash_len=32,
        type=Type.I,
    )


def derive_key(passphrase: str, salt_hex: str, kdf: str = "auto") -> bytes:
    """Key derivation with an explicit KDF choice.

    - ``argon2i``: byte-for-byte reference interop (CreateCipher.go:26).
      Requires an Argon2i backend (cryptography>=48 or argon2-cffi);
      raises RuntimeError if none is present rather than silently
      deriving a different key.
    - ``argon2id``: same cost parameters — self-consistent
      encrypt/decrypt, NOT interoperable with Go-railgun ciphertexts.
    - ``auto``: argon2i when a backend is available; otherwise a loud
      RuntimeWarning downgrade to argon2id (never a silent switch).
    """
    if kdf not in _KDFS:
        raise ValueError(f"kdf must be one of {_KDFS}, got {kdf!r}")
    salt = bytes.fromhex(salt_hex)
    if kdf in ("auto", "argon2i"):
        try:
            return _argon2i_go_params(passphrase, salt)
        except ImportError:
            if kdf == "argon2i":
                raise RuntimeError(
                    "an Argon2i backend (cryptography>=48 or argon2-cffi) is "
                    "required for Argon2i key derivation (Go-railgun .enc "
                    "interop, CreateCipher.go:26); install one, or pass "
                    "kdf='argon2id' for self-consistent but non-interoperable "
                    "encryption"
                ) from None
            import warnings

            warnings.warn(
                "no Argon2i backend: deriving with Argon2id instead of "
                "the reference's Argon2i — ciphertexts are NOT interoperable "
                "with Go-railgun .enc payloads; pass kdf='argon2id' to "
                "acknowledge and silence this warning",
                RuntimeWarning,
                stacklevel=2,
            )
    from cryptography.exceptions import UnsupportedAlgorithm
    from cryptography.hazmat.primitives.kdf.argon2 import Argon2id

    kdf_impl = Argon2id(salt=salt, length=32, iterations=3, lanes=4, memory_cost=32 * 1024)
    try:
        return kdf_impl.derive(passphrase.encode())
    except UnsupportedAlgorithm:
        raise RuntimeError(
            "no usable Argon2 backend: cryptography is installed but its "
            "OpenSSL lacks the Argon2 KDF (needs OpenSSL>=3.2), and "
            "argon2-cffi is absent — install argon2-cffi or upgrade OpenSSL"
        ) from None


def _cfb(iv: bytes):
    """CFB mode via its post-deprecation import path. The reference's wire
    format is fixed at AES-256-CFB (CreateCipher.go:30), but `cryptography`
    moves CFB to hazmat.decrepit in release 49 — the decrepit path (present
    since 48) is tried first so decryption neither warns today nor breaks
    the day the primitives path drops the symbol."""
    try:
        from cryptography.hazmat.decrepit.ciphers.modes import CFB
    except ImportError:  # cryptography < 48: only the primitives path exists
        from cryptography.hazmat.primitives.ciphers.modes import CFB
    return CFB(iv)


def decrypt_bytes(data: bytes, passphrase: str, salt_hex: str, kdf: str = "auto") -> bytes:
    """IV-prefixed AES-256-CFB decrypt (DecryptBytes.go:27-41)."""
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms

    key = derive_key(passphrase, salt_hex, kdf=kdf)
    iv, body = data[:16], data[16:]
    cipher = Cipher(algorithms.AES(key), _cfb(iv))
    dec = cipher.decryptor()
    return dec.update(body) + dec.finalize()


def encrypt_bytes(
    data: bytes, passphrase: str, salt_hex: str, iv: bytes | None = None, kdf: str = "auto"
) -> bytes:
    """Encrypt twin (round-trip testing + output-side parity,
    cli/process.go:59-112 '.enc' output)."""
    import os

    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms

    key = derive_key(passphrase, salt_hex, kdf=kdf)
    iv = iv or os.urandom(16)
    enc = Cipher(algorithms.AES(key), _cfb(iv)).encryptor()
    return iv + enc.update(data) + enc.finalize()


def _decode_plain(plain: bytes, source: str, kdf: str) -> str:
    """Decode decrypted bytes to text, failing LOUDLY on garbage: CFB with a
    wrong key/KDF yields undecodable bytes, and the worst failure mode is a
    confusing downstream parse error instead of this diagnosis."""
    try:
        return plain.decode("utf-8")
    except UnicodeDecodeError as e:
        raise ValueError(
            f"decryption of {source} produced undecodable bytes — wrong "
            f"passphrase/salt, or a KDF mismatch (Go-railgun .enc payloads "
            f"use Argon2i; this decrypt used kdf={kdf!r})"
        ) from e


def write_encrypted(
    df, path: str, passphrase: str, salt_hex: str, fmt: str = "jsonl", kdf: str = "auto"
) -> None:
    """Serialize a DataFrame to one encrypted payload file — output-side
    twin of the reference's '.enc' sink (cli/process.go:59-112; note
    process.go:663: the block cipher forces whole-payload output, so this
    is inherently a driver-side single-file write for config-sized data,
    not the 100 TB path)."""
    import json as _json

    rows = [r.asDict(recursive=True) for r in df.collect()]
    if fmt == "jsonl":
        plain = "\n".join(_json.dumps(r, default=str) for r in rows).encode()
    elif fmt == "json":
        plain = _json.dumps(rows, default=str).encode()
    else:
        raise NotImplementedError(f"encrypted output format {fmt}")
    with open(path, "wb") as f:
        f.write(encrypt_bytes(plain, passphrase, salt_hex, kdf=kdf))


def read_encrypted_many(
    spark, path: str, passphrase: str, salt_hex: str, fmt: str = "jsonl", kdf: str = "auto"
):
    """Distributed decrypt for MANY .enc shards: a binaryFile scan with the
    AES decrypt + decode inside mapInPandas — one Arrow-batched Python hop,
    shards decrypt in parallel across executors (the scale path when .enc
    holds data, not config). Schema comes from one shard fetched THROUGH
    Spark (works on s3a://, hdfs://, any Hadoop scheme — no local open());
    every executor then emits from_json rows against it.
    """
    import json as _json

    from pyspark.sql import functions as F

    if fmt not in ("jsonl", "json"):
        raise NotImplementedError(f"distributed encrypted read for format {fmt}")

    files = spark.read.format("binaryFile").load(path)
    # column-pruned listing scan: content bytes are not read to pick the probe
    first = files.select("path").orderBy("path").first()
    if first is None:
        raise ValueError(f"no files matched {path}")
    probe_row = files.filter(F.col("path") == first["path"]).select("content").first()
    probe = _decode_plain(
        decrypt_bytes(bytes(probe_row["content"]), passphrase, salt_hex, kdf=kdf),
        first["path"],
        kdf,
    )
    try:
        probe_lines = (
            probe.splitlines()
            if fmt == "jsonl"
            else [_json.dumps(r) for r in _json.loads(probe)]
        )
    except ValueError as e:  # garbage that happened to be valid UTF-8
        raise ValueError(
            f"decryption of {first['path']} produced undecodable content — "
            f"wrong passphrase/salt, or a KDF mismatch (Go-railgun .enc "
            f"payloads use Argon2i; this decrypt used kdf={kdf!r})"
        ) from e
    schema = spark.read.json(spark.sparkContext.parallelize(probe_lines[:100])).schema

    def _decrypt(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for blob in pdf["content"]:
                plain = decrypt_bytes(bytes(blob), passphrase, salt_hex, kdf=kdf).decode()
                if fmt == "jsonl":
                    out.extend(line for line in plain.splitlines() if line.strip())
                else:
                    doc = _json.loads(plain)
                    out.extend(_json.dumps(r) for r in (doc if isinstance(doc, list) else [doc]))
            yield pd.DataFrame({"value": out})

    lines = files.select("content").mapInPandas(_decrypt, "value string")
    return lines.select(F.from_json("value", schema).alias("r")).select("r.*")


def read_encrypted(
    spark, path: str, passphrase: str, salt_hex: str, fmt: str = "jsonl", kdf: str = "auto"
):
    """Read an encrypted payload into a DataFrame: binaryFile scan ->
    decrypt -> decode. Single-payload files decode driver-side; at scale,
    many .enc shards decrypt in parallel via the binaryFile source."""
    import json as _json

    from railgun_spark.sources.formats import _decode_document

    files = spark.read.format("binaryFile").load(path).select("path", "content").collect()
    rows: list[dict] = []
    for r in files:
        plain = decrypt_bytes(bytes(r["content"]), passphrase, salt_hex, kdf=kdf)
        # A wrong key yields garbage that USUALLY fails UTF-8 decode but can
        # occasionally pass it — the parse step must produce the same loud
        # wrong-passphrase/KDF diagnosis, not a bare JSONDecodeError.
        try:
            if fmt == "jsonl":
                text = _decode_plain(plain, r["path"], kdf)
                rows.extend(_json.loads(line) for line in text.splitlines() if line.strip())
            elif fmt == "json":
                doc = _json.loads(_decode_plain(plain, r["path"], kdf))
                rows.extend(doc if isinstance(doc, list) else [doc])
            else:
                rows.extend(_decode_document(plain, fmt))
        except ValueError as e:  # JSONDecodeError is a ValueError
            if "undecodable" in str(e):
                raise
            raise ValueError(
                f"decryption of {r['path']} produced undecodable content — "
                f"wrong passphrase/salt, or a KDF mismatch (Go-railgun .enc "
                f"payloads use Argon2i; this decrypt used kdf={kdf!r})"
            ) from e
    return spark.read.json(spark.sparkContext.parallelize([_json.dumps(r) for r in rows]))
