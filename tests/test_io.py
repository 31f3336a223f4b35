"""IO tests: ark/scp round-trip, compressed matrices, wave parsing,
data dirs."""

import io
import struct

import numpy as np
import pytest

from eesen_tpu.io.kaldi_io import (
    read_ark, read_scp, read_scp_entry, read_rspecifier, write_ark,
    read_matrix, write_matrix,
)
from eesen_tpu.io.wave import parse_wav_bytes
from eesen_tpu.io.datadir import DataDir


def test_matrix_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    m = rng.standard_normal((17, 9)).astype(np.float32)
    buf = io.BytesIO()
    write_matrix(buf, m)
    buf.seek(0)
    got = read_matrix(io.BufferedReader(buf))
    np.testing.assert_array_equal(got, m)


def test_ark_scp_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    items = {
        "utt_a": rng.standard_normal((5, 3)).astype(np.float32),
        "utt_b": rng.standard_normal((8, 3)).astype(np.float32),
        "utt_c": np.array([3, 1, 4, 1, 5], dtype=np.int32),
    }
    ark = str(tmp_path / "data.ark")
    scp = str(tmp_path / "data.scp")
    write_ark(ark, items.items(), scp_path=scp)

    got = dict(read_ark(ark))
    assert set(got) == set(items)
    for k in items:
        np.testing.assert_array_equal(got[k], items[k])

    table = read_scp(scp)
    for k in items:
        np.testing.assert_array_equal(read_scp_entry(table[k]), items[k])

    got2 = dict(read_rspecifier(f"scp:{scp}"))
    np.testing.assert_array_equal(got2["utt_b"], items["utt_b"])


def test_compressed_matrix_read(tmp_path):
    """Build a CM-format entry by hand and verify decompression math."""
    rng = np.random.default_rng(2)
    rows, cols = 10, 4
    mat = rng.standard_normal((rows, cols)).astype(np.float32)
    min_v = float(mat.min())
    rng_v = float(mat.max() - mat.min()) or 1.0

    def f2u16(v):
        f = (v - min_v) / rng_v
        return int(np.clip(f, 0, 1) * 65535 + 0.499)

    def u16tof(u):
        return min_v + u * (rng_v / 65535.0)

    buf = io.BytesIO()
    buf.write(b"utt1 \x00BCM ")
    buf.write(struct.pack("<ffii", min_v, rng_v, rows, cols))
    headers = []
    byte_cols = []
    for c in range(cols):
        col = np.sort(mat[:, c])
        p0 = min(f2u16(col[0]), 65532)
        p25 = min(max(f2u16(col[rows // 4]), p0 + 1), 65533)
        p75 = min(max(f2u16(col[3 * rows // 4]), p25 + 1), 65534)
        p100 = max(f2u16(col[-1]), p75 + 1)
        headers.append((p0, p25, p75, p100))
        fp = [u16tof(x) for x in (p0, p25, p75, p100)]

        def to_char(v):
            # piecewise-linear inverse of CharToFloat
            if v <= fp[1]:
                c_ = 64.0 * (v - fp[0]) / max(fp[1] - fp[0], 1e-9)
            elif v <= fp[2]:
                c_ = 64 + 128.0 * (v - fp[1]) / max(fp[2] - fp[1], 1e-9)
            else:
                c_ = 192 + 63.0 * (v - fp[2]) / max(fp[3] - fp[2], 1e-9)
            return int(np.clip(round(c_), 0, 255))

        byte_cols.append([to_char(v) for v in mat[:, c]])
    for h in headers:
        buf.write(struct.pack("<HHHH", *h))
    for bc in byte_cols:
        buf.write(bytes(bc))
    path = str(tmp_path / "cm.ark")
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    (key, got), = list(read_ark(path))
    assert key == "utt1"
    assert got.shape == mat.shape
    # lossy 8-bit compression: tolerance scaled to range
    assert np.max(np.abs(got - mat)) < rng_v / 40


def test_text_entries(tmp_path):
    path = str(tmp_path / "labels.ark")
    with open(path, "w") as f:
        f.write("utt1 3 5 7\nutt2 1 2\n")
    got = dict(read_ark(path))
    np.testing.assert_array_equal(got["utt1"], [3, 5, 7])
    np.testing.assert_array_equal(got["utt2"], [1, 2])
    assert got["utt1"].dtype == np.int32


def test_wave_parse():
    rate = 16000
    samples = (np.sin(np.linspace(0, 100, 1600)) * 10000).astype("<i2")
    body = samples.tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    arr, sr = parse_wav_bytes(hdr)
    assert sr == rate and arr.shape == (1, 1600)
    np.testing.assert_allclose(arr[0], samples.astype(np.float32))


def test_datadir_roundtrip(tmp_path):
    d = DataDir.write(
        str(tmp_path / "data"),
        wav_scp={"u1": "/x/u1.wav", "u2": "/x/u2.wav"},
        text={"u1": ["HELLO", "WORLD"], "u2": ["HI"]},
        utt2spk={"u1": "spk1", "u2": "spk2"},
    )
    d.validate()
    assert d.utt_ids == ["u1", "u2"]
    assert d.spk2utt["spk1"] == ["u1"]
    d.filter_utts(["u1"])
    assert d.utt_ids == ["u1"]

    bad = DataDir.write(
        str(tmp_path / "bad"),
        wav_scp={"u1": "/x/u1.wav", "u2": "/x/u2.wav"},
        text={"u1": ["HELLO"]},
    )
    with pytest.raises(ValueError):
        bad.validate()


def test_compressed_matrix_write_roundtrip(tmp_path):
    from eesen_tpu.io.kaldi_io import write_ark, read_ark

    rng = np.random.default_rng(9)
    m = rng.standard_normal((40, 13)).astype(np.float32) * 3
    path = str(tmp_path / "cm_w.ark")
    write_ark(path, [("u1", m)], compress=True)
    (k, got), = list(read_ark(path))
    assert k == "u1" and got.shape == m.shape
    # 8-bit lossy: tolerance relative to the value range
    span = float(m.max() - m.min())
    assert np.max(np.abs(got - m)) < span / 40


def test_datadir_splits(tmp_path):
    wav = {f"u{i}": f"/x/u{i}.wav" for i in range(20)}
    text = {k: ["HI"] for k in wav}
    utt2spk = {f"u{i}": f"spk{i % 5}" for i in range(20)}
    d = DataDir.write(
        str(tmp_path / "d"), wav_scp=wav, text=text, utt2spk=utt2spk
    )
    tr, cv = d.split_tr_cv(cv_fraction=0.2)
    assert sorted(tr + cv) == d.utt_ids
    # speaker-disjoint
    tr_spk = {utt2spk[u] for u in tr}
    cv_spk = {utt2spk[u] for u in cv}
    assert not (tr_spk & cv_spk)
    shards = d.split_shards(3)
    assert sorted(sum(shards, [])) == d.utt_ids
    assert abs(len(shards[0]) - len(shards[2])) <= 1


def test_compressed_matrix_cm2_roundtrip(tmp_path):
    """<=8-row matrices use the all-uint16 CM2 format
    (compressed-matrix.cc:79-85); verify write+read round trip."""
    from eesen_tpu.io.kaldi_io import read_ark, write_ark

    rng = np.random.default_rng(5)
    m = (rng.standard_normal((6, 13)) * 4).astype(np.float32)
    path = str(tmp_path / "cm2.ark")
    write_ark(path, [("u1", m)], compress=True)
    with open(path, "rb") as f:
        head = f.read(10)
    assert b"CM2 " in head
    (key, back), = list(read_ark(path))
    assert key == "u1" and back.shape == m.shape
    # 16-bit quantization over the matrix range: tight tolerance
    rng_v = float(m.max() - m.min())
    np.testing.assert_allclose(back, m, atol=rng_v / 65535.0 * 1.01)


def test_compressed_matrix_cm2_handbuilt(tmp_path):
    """Hand-built CM2 entry decodes with the exact reference formula
    value = min + range * v / 65535 (compressed-matrix.cc:233-239)."""
    from eesen_tpu.io.kaldi_io import read_ark

    codes = np.array([[0, 65535, 32768]], dtype="<u2")
    path = str(tmp_path / "cm2h.ark")
    with open(path, "wb") as f:
        f.write(b"utt9 \x00BCM2 ")
        f.write(struct.pack("<ffii", -2.0, 4.0, 1, 3))
        f.write(codes.tobytes())
    (key, m), = list(read_ark(path))
    assert key == "utt9"
    np.testing.assert_allclose(
        m[0], [-2.0, 2.0, -2.0 + 4.0 * 32768 / 65535],
        rtol=1e-6, atol=1e-6,   # float32 storage of the midpoint
    )
