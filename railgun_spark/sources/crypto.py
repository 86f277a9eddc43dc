"""AES-256-CFB payload decryption — loader-level twin of the reference's
encrypted-input support (`.enc` suffix, railgun/util/DecryptBytes.go:17-41,
key derivation railgun/util/CreateCipher.go:19-34):

  key = argon2id(passphrase, salt=hex-decoded salt, 32 bytes)
  ciphertext = IV (16 bytes) || CFB stream

Decryption happens at the loader (driver or a mapInPandas over
binaryFile), never as a column type — matching the reference, where
decryption wraps the byte stream before deserialization
(railgun/cli/process.go:892-895)."""

from __future__ import annotations


def derive_key(passphrase: str, salt_hex: str) -> bytes:
    """Key derivation. The reference (CreateCipher.go:26) calls argon2.Key —
    that is Argon2i with time=3, memory=32 MiB, lanes=4, keyLen=32. When
    argon2-cffi is installed we derive with exactly that (Argon2i), so
    reference-encrypted payloads decrypt byte-for-byte. This container only
    ships `cryptography`, whose KDF module is Argon2id-only; the fallback
    uses Argon2id with the same cost parameters — self-consistent
    encrypt/decrypt, but NOT interoperable with Go-railgun ciphertexts."""
    salt = bytes.fromhex(salt_hex)
    try:
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
    except ImportError:
        from cryptography.hazmat.primitives.kdf.argon2 import Argon2id

        kdf = Argon2id(salt=salt, length=32, iterations=3, lanes=4, memory_cost=32 * 1024)
        return kdf.derive(passphrase.encode())


def decrypt_bytes(data: bytes, passphrase: str, salt_hex: str) -> bytes:
    """IV-prefixed AES-256-CFB decrypt (DecryptBytes.go:27-41)."""
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    key = derive_key(passphrase, salt_hex)
    iv, body = data[:16], data[16:]
    cipher = Cipher(algorithms.AES(key), modes.CFB(iv))
    dec = cipher.decryptor()
    return dec.update(body) + dec.finalize()


def encrypt_bytes(data: bytes, passphrase: str, salt_hex: str, iv: bytes | None = None) -> bytes:
    """Encrypt twin (round-trip testing + output-side parity,
    cli/process.go:59-112 '.enc' output)."""
    import os

    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    key = derive_key(passphrase, salt_hex)
    iv = iv or os.urandom(16)
    enc = Cipher(algorithms.AES(key), modes.CFB(iv)).encryptor()
    return iv + enc.update(data) + enc.finalize()


def write_encrypted(df, path: str, passphrase: str, salt_hex: str, fmt: str = "jsonl") -> None:
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
        f.write(encrypt_bytes(plain, passphrase, salt_hex))


def read_encrypted_many(spark, path: str, passphrase: str, salt_hex: str, fmt: str = "jsonl"):
    """Distributed decrypt for MANY .enc shards: a binaryFile scan with the
    AES decrypt + decode inside mapInPandas — one Arrow-batched Python hop,
    shards decrypt in parallel across executors (the scale path when .enc
    holds data, not config). Schema comes from one driver-side decrypt of
    the first shard; every executor then emits from_json rows against it.
    """
    import json as _json

    from pyspark.sql import functions as F

    if fmt not in ("jsonl", "json"):
        raise NotImplementedError(f"distributed encrypted read for format {fmt}")

    files = spark.read.format("binaryFile").load(path)
    first = files.select("path").orderBy("path").first()
    if first is None:
        raise ValueError(f"no files matched {path}")
    with open(first["path"].replace("file:", ""), "rb") as f:
        probe = decrypt_bytes(f.read(), passphrase, salt_hex).decode()
    probe_lines = (
        probe.splitlines()
        if fmt == "jsonl"
        else [_json.dumps(r) for r in _json.loads(probe)]
    )
    schema = spark.read.json(spark.sparkContext.parallelize(probe_lines[:100])).schema

    def _decrypt(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for blob in pdf["content"]:
                plain = decrypt_bytes(bytes(blob), passphrase, salt_hex).decode()
                if fmt == "jsonl":
                    out.extend(line for line in plain.splitlines() if line.strip())
                else:
                    doc = _json.loads(plain)
                    out.extend(_json.dumps(r) for r in (doc if isinstance(doc, list) else [doc]))
            yield pd.DataFrame({"value": out})

    lines = files.select("content").mapInPandas(_decrypt, "value string")
    return lines.select(F.from_json("value", schema).alias("r")).select("r.*")


def read_encrypted(spark, path: str, passphrase: str, salt_hex: str, fmt: str = "jsonl"):
    """Read an encrypted payload into a DataFrame: binaryFile scan ->
    decrypt -> decode. Single-payload files decode driver-side; at scale,
    many .enc shards decrypt in parallel via the binaryFile source."""
    import json as _json

    from railgun_spark.sources.formats import _decode_document

    files = spark.read.format("binaryFile").load(path).select("content").collect()
    rows: list[dict] = []
    for r in files:
        plain = decrypt_bytes(bytes(r["content"]), passphrase, salt_hex)
        if fmt == "jsonl":
            rows.extend(_json.loads(line) for line in plain.decode().splitlines() if line.strip())
        elif fmt == "json":
            doc = _json.loads(plain.decode())
            rows.extend(doc if isinstance(doc, list) else [doc])
        else:
            rows.extend(_decode_document(plain, fmt))
    return spark.read.json(spark.sparkContext.parallelize([_json.dumps(r) for r in rows]))
