"""Parquet modular encryption (AES_GCM_V1) — self round-trips and
pyarrow interop through a toy KMS (parquet/src/encryption/ parity:
ciphers.rs framing, modules.rs AADs, encrypt.rs/decrypt.rs
properties)."""

import base64
import io

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import arrow_tpu as at
from arrow_tpu.io.parquet_crypto import (FileDecryptionProperties,
                                         FileEncryptionProperties,
                                         pkmt1_key_material,
                                         pkmt1_unwrap)
from arrow_tpu.io.parquet_native import ParquetFile
from arrow_tpu.io.parquet_writer import write_parquet_native

FK = b"0123456789012345"
CK = b"abcdefghabcdefgh"
CK2 = b"ABCDEFGHABCDEFGH"


def _table(n=2000):
    rng = np.random.default_rng(3)
    return at.Table.from_pyarrow(pa.table({
        "a": pa.array(rng.integers(-10**6, 10**6, n),
                      mask=rng.random(n) < 0.1),
        "b": pa.array([f"s{i % 23}" if i % 17 else None
                       for i in range(n)]),
        "f": pa.array(rng.random(n)),
    }))


def _roundtrip(t, enc, dec, **kw):
    buf = io.BytesIO()
    write_parquet_native(buf, t, encryption=enc, **kw)
    data = buf.getvalue()
    assert data[:4] == b"PARE" and data[-4:] == b"PARE"
    pf = ParquetFile(data, decryption=dec)
    assert pf.read().to_pydict() == t.to_pydict()
    return data, pf


class TestSelfRoundtrip:
    def test_uniform_footer_key(self):
        t = _table()
        _roundtrip(t, FileEncryptionProperties(footer_key=FK),
                   FileDecryptionProperties(footer_key=FK))

    @pytest.mark.parametrize("ver", ["1.0", "2.0"])
    @pytest.mark.parametrize("comp", ["none", "snappy", "zstd"])
    def test_uniform_pages_codecs(self, ver, comp):
        t = _table(3000)
        _roundtrip(t, FileEncryptionProperties(footer_key=FK),
                   FileDecryptionProperties(footer_key=FK),
                   compression=comp, data_page_version=ver,
                   data_page_size=2048)

    def test_column_keys_and_plaintext_mix(self):
        t = _table()
        enc = FileEncryptionProperties(
            footer_key=FK, column_keys={"a": CK, "f": CK2})
        dec = FileDecryptionProperties(
            footer_key=FK, column_keys={"a": CK, "f": CK2})
        data, pf = _roundtrip(t, enc, dec)
        # column b stayed plaintext: readable with footer key only via
        # a projection
        pf2 = ParquetFile(data,
                          decryption=FileDecryptionProperties(
                              footer_key=FK))
        got = pf2.read(columns=["b"])
        assert got.column("b").to_pylist() == \
            t.column("b").to_pylist()

    def test_aad_prefix_stored_and_supplied(self):
        t = _table(300)
        # stored prefix: reader needs no prior knowledge
        _roundtrip(t, FileEncryptionProperties(
            footer_key=FK, aad_prefix=b"job-42"),
            FileDecryptionProperties(footer_key=FK))
        # unstored prefix: reader must supply it...
        enc = FileEncryptionProperties(
            footer_key=FK, aad_prefix=b"job-42",
            store_aad_prefix=False)
        buf = io.BytesIO()
        write_parquet_native(buf, t, encryption=enc)
        data = buf.getvalue()
        pf = ParquetFile(data, decryption=FileDecryptionProperties(
            footer_key=FK, aad_prefix=b"job-42"))
        assert pf.read().to_pydict() == t.to_pydict()
        # ...and the wrong prefix fails authentication
        with pytest.raises(Exception):
            ParquetFile(data, decryption=FileDecryptionProperties(
                footer_key=FK, aad_prefix=b"job-43"))

    def test_multi_row_group_page_index(self):
        t = _table(5000)
        enc = FileEncryptionProperties(footer_key=FK,
                                       column_keys={"a": CK})
        dec = FileDecryptionProperties(footer_key=FK,
                                       column_keys={"a": CK})
        data, pf = _roundtrip(t, enc, dec, row_group_size=1500,
                              write_page_index=True,
                              data_page_size=2048)
        assert len(pf.row_groups) == 4
        ci = pf.column_index(0, "a")      # decrypted ColumnIndex
        oi = pf.offset_index(0, "a")
        assert ci is not None and len(ci["min_values"]) == len(oi) > 1

    def test_wrong_key_and_tamper_rejected(self):
        t = _table(200)
        buf = io.BytesIO()
        write_parquet_native(buf, t, encryption=FileEncryptionProperties(
            footer_key=FK))
        data = buf.getvalue()
        with pytest.raises(Exception):
            ParquetFile(data, decryption=FileDecryptionProperties(
                footer_key=CK)).read()
        # flip one ciphertext byte in the middle of the file
        bad = bytearray(data)
        bad[len(bad) // 2] ^= 0x40
        with pytest.raises(Exception):
            ParquetFile(bytes(bad),
                        decryption=FileDecryptionProperties(
                            footer_key=FK)).read()

    def test_missing_decryption_raises(self):
        t = _table(50)
        buf = io.BytesIO()
        write_parquet_native(buf, t, encryption=FileEncryptionProperties(
            footer_key=FK))
        with pytest.raises(Exception, match="encrypted footer"):
            ParquetFile(buf.getvalue())

    def test_writer_properties_plumbing(self, tmp_path):
        from arrow_tpu.io.parquet_io import (ParquetReaderBuilder,
                                             WriterProperties,
                                             read_parquet,
                                             write_parquet)
        t = _table(400)
        p = str(tmp_path / "enc.parquet")
        write_parquet(p, t, WriterProperties(
            encryption=FileEncryptionProperties(footer_key=FK)))
        dec = FileDecryptionProperties(footer_key=FK)
        assert read_parquet(p, decryption=dec).to_pydict() == \
            t.to_pydict()
        batches = list(ParquetReaderBuilder(p).with_decryption(dec)
                       .with_projection(["a"]).build())
        assert sum(b.num_rows for b in batches) == 400


# ---------------------------------------------------------------------------
# pyarrow interop through a toy KMS (single wrap, internal key material)
# ---------------------------------------------------------------------------

MASTER = {"kf": b"0000111122223333", "kc": b"4444555566667777"}


def _kms_bits():
    import pyarrow.parquet.encryption as pe

    class KC(pe.KmsClient):
        def __init__(self, config):
            super().__init__()

        def wrap_key(self, key_bytes, master_key_identifier):
            return base64.b64encode(
                MASTER[master_key_identifier] + key_bytes).decode()

        def unwrap_key(self, wrapped_key, master_key_identifier):
            raw = base64.b64decode(wrapped_key)
            assert raw[:16] == MASTER[master_key_identifier]
            return raw[16:]

    factory = pe.CryptoFactory(lambda cfg: KC(cfg))
    kms = pe.KmsConnectionConfig()
    return pe, KC, factory, kms


class TestPyarrowInterop:
    def test_pyarrow_writes_we_read(self):
        pe, KC, factory, kms = _kms_bits()
        conf = pe.EncryptionConfiguration(
            footer_key="kf", column_keys={"kc": ["a"]},
            encryption_algorithm="AES_GCM_V1", double_wrapping=False,
            data_key_length_bits=128, cache_lifetime=None)
        fep = factory.file_encryption_properties(kms, conf)
        tab = pa.table({"a": list(range(500)),
                        "b": [f"s{i%7}" for i in range(500)]})
        buf = io.BytesIO()
        with pq.ParquetWriter(buf, tab.schema,
                              encryption_properties=fep) as w:
            w.write_table(tab)

        kc = KC(None)
        dec = FileDecryptionProperties(key_retriever=lambda km:
                                       pkmt1_unwrap(km, kc.unwrap_key))
        pf = ParquetFile(buf.getvalue(), decryption=dec)
        got = pf.read()
        for name in tab.column_names:
            assert got.column(name).to_pylist() == \
                tab[name].to_pylist(), name

    def test_we_write_pyarrow_reads(self):
        pe, KC, factory, kms = _kms_bits()
        kc = KC(None)
        fk, ck = b"aaaabbbbccccdddd", b"eeeeffffgggghhhh"
        enc = FileEncryptionProperties(
            footer_key=fk, column_keys={"a": ck},
            footer_key_metadata=pkmt1_key_material(
                kc.wrap_key(fk, "kf"), "kf", True),
            column_key_metadata={"a": pkmt1_key_material(
                kc.wrap_key(ck, "kc"), "kc", False)})
        t = _table(500)
        buf = io.BytesIO()
        write_parquet_native(buf, t, encryption=enc)
        dep = factory.file_decryption_properties(
            kms, pe.DecryptionConfiguration(cache_lifetime=None))
        got = pq.ParquetFile(io.BytesIO(buf.getvalue()),
                             decryption_properties=dep).read()
        exp = t.to_pydict()
        for name in ("a", "b", "f"):
            assert got[name].to_pylist() == exp[name], name

    def test_we_write_uniform_pyarrow_reads(self):
        pe, KC, factory, kms = _kms_bits()
        kc = KC(None)
        fk = b"aaaabbbbccccdddd"
        enc = FileEncryptionProperties(
            footer_key=fk,
            footer_key_metadata=pkmt1_key_material(
                kc.wrap_key(fk, "kf"), "kf", True))
        t = _table(500)
        buf = io.BytesIO()
        write_parquet_native(buf, t, encryption=enc,
                             row_group_size=200)
        dep = factory.file_decryption_properties(
            kms, pe.DecryptionConfiguration(cache_lifetime=None))
        got = pq.ParquetFile(io.BytesIO(buf.getvalue()),
                             decryption_properties=dep).read()
        exp = t.to_pydict()
        for name in ("a", "b", "f"):
            assert got[name].to_pylist() == exp[name], name
