"""Corpus data-prep tests over mock corpus trees.

Each test builds the directory layout the real corpus ships with (tiny)
and checks the produced Kaldi data dir against the reference scripts'
conventions (utterance/speaker naming, pipe commands, normalizations)."""

import os

import pytest

from eesen_tpu.io.datadir import DataDir
from eesen_tpu.recipes.data_prep import (
    find_wsj_transcripts, hkust_prep, librispeech_prep, map_swbd_word,
    ndx2flist, normalize_wsj_transcript, swbd1_prep, tedlium_prep,
    wsj_prep,
)


def _touch(path, content=""):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    mode = "wb" if isinstance(content, bytes) else "w"
    with open(path, mode) as f:
        f.write(content)


class TestLibriSpeech:
    def test_prep(self, tmp_path):
        src = tmp_path / "train-clean-100"
        _touch(str(src / "19" / "198" / "19-198.trans.txt"),
               "19-198-0000 HELLO WORLD\n19-198-0001 GOOD DAY\n")
        _touch(str(src / "19" / "198" / "19-198-0000.flac"), b"")
        _touch(str(src / "19" / "198" / "19-198-0001.flac"), b"")
        _touch(str(src / "26" / "495" / "26-495.trans.txt"),
               "26-495-0000 ANOTHER ONE\n")
        _touch(str(src / "26" / "495" / "26-495-0000.flac"), b"")
        d = librispeech_prep(str(src), str(tmp_path / "data"))
        d.validate()
        assert len(d.wav_scp) == 3
        assert d.text["19-198-0000"] == ["HELLO", "WORLD"]
        assert d.utt2spk["26-495-0000"] == "26-495"
        # reference pipe command (data_prep.sh:57-58)
        assert d.wav_scp["19-198-0000"].startswith("flac -c -d -s ")
        assert d.wav_scp["19-198-0000"].endswith(".flac |")

    def test_missing_transcript_dropped(self, tmp_path):
        src = tmp_path / "x"
        _touch(str(src / "1" / "2" / "1-2.trans.txt"), "1-2-0000 A\n")
        _touch(str(src / "1" / "2" / "1-2-0000.flac"), b"")
        _touch(str(src / "1" / "2" / "1-2-0001.flac"), b"")  # no text
        d = librispeech_prep(str(src), str(tmp_path / "d"))
        assert sorted(d.wav_scp) == ["1-2-0000"]


class TestWsj:
    def test_ndx2flist(self, tmp_path):
        d1 = str(tmp_path / "11-2.1")
        d2 = str(tmp_path / "13-34.1")
        os.makedirs(d1), os.makedirs(d2)
        lines = [
            ";; comment",
            "11_2_1:wsj0/si_tr_s/01v/01vc0201.wv1",
            "13_34_1: wsj1/si_tr_s/4k0/4k0c0301.wv1",
        ]
        out = ndx2flist(lines, [d1, d2])
        assert out == [
            os.path.join(d1, "wsj0/si_tr_s/01v/01vc0201.wv1"),
            os.path.join(d2, "wsj1/si_tr_s/4k0/4k0c0301.wv1"),
        ]

    def test_normalize_transcript(self):
        words = (
            "And new hardware such as I\\. [loud_breath] <the> "
            "[door_slam>] --DASH ~ . %PERCENT"
        ).split()
        out = normalize_wsj_transcript(words)
        assert out == [
            "AND", "NEW", "HARDWARE", "SUCH", "AS", "I.", "<NOISE>",
            "THE", "-DASH", "PERCENT",
        ]

    def test_full_prep(self, tmp_path):
        disk = tmp_path / "11-13.1"
        ndx = disk / "wsj0" / "doc" / "indices" / "train" / "tr_s_wv1.ndx"
        _touch(str(ndx), "11_13_1:wsj0/si_tr_s/01v/01vc0201.wv1\n"
                         "11_13_1:wsj0/si_tr_s/01v/01vc0202.wv1\n")
        _touch(str(disk / "wsj0/si_tr_s/01v/01vc0201.wv1"), b"")
        _touch(str(disk / "wsj0/si_tr_s/01v/01vc0202.wv1"), b"")
        _touch(
            str(disk / "wsj0/transcrp/dots/01v/01vc0200.dot"),
            "this is one (01vc0201)\nthis is two [breath] (01vc0202)\n",
        )
        dirs = wsj_prep([str(disk)], str(tmp_path / "data"))
        d = dirs["train_si84"]
        d.validate()
        assert sorted(d.text) == ["01vc0201", "01vc0202"]
        assert d.text["01vc0202"] == ["THIS", "IS", "TWO", "<NOISE>"]
        assert d.utt2spk["01vc0201"] == "01v"
        assert d.wav_scp["01vc0201"].startswith("sph2pipe -f wav ")


class TestTedlium:
    def test_prep(self, tmp_path):
        db = tmp_path / "TEDLIUM_release1"
        _touch(
            str(db / "dev" / "stm" / "TalkA.stm"),
            ";; header\n"
            "TalkA 1 TalkA 0.00 3.50 <o,f0,male> hello (2) world <sil>\n"
            "TalkA 1 TalkA 4.00 6.00 <o,f0,male> ignore_time_segment_in_scoring\n"
            "TalkA 1 TalkA 7.25 9.00 <o,f0,male> {NOISE} again\n",
        )
        _touch(str(db / "dev" / "sph" / "TalkA.sph"), b"")
        dirs = tedlium_prep(str(db), str(tmp_path / "data"), sets=("dev",))
        d = dirs["dev"]
        utts = sorted(d.text)
        assert utts == ["TalkA-0000000-0000350", "TalkA-0000725-0000900"]
        assert d.text["TalkA-0000000-0000350"] == ["hello", "world"]
        assert d.text["TalkA-0000725-0000900"] == ["[NOISE]", "again"]
        rec, s, e = d.segments["TalkA-0000000-0000350"]
        assert rec == "TalkA" and s == 0.0 and e == 3.5
        assert d.wav_scp["TalkA"].startswith("sph2pipe -f wav -p ")


class TestSwbd:
    @pytest.mark.parametrize("w,expect", [
        ("[laughter-story]", "story"),
        ("[it'n/isn't]", "it'n"),
        ("ab[solute]-", "ab-"),
        ("them_1", "them"),
        ("okay", "okay"),
        ("[noise]", "[noise]"),
    ])
    def test_map_words(self, w, expect):
        assert map_swbd_word(w) == expect

    def test_prep(self, tmp_path):
        swbd = tmp_path / "swbd"
        _touch(str(swbd / "disc1" / "sw02001.sph"), b"")
        _touch(
            str(swbd / "transcriptions" / "swb_ms98_transcriptions"
                / "20" / "2001" / "sw2001A-ms98-a-trans.text"),
            "sw2001A-ms98-a-0001 0.50 2.75 [silence] hello there\n"
            "sw2001A-ms98-a-0002 3.00 4.00 [silence]\n",
        )
        d = swbd1_prep(str(swbd), str(tmp_path / "data"))
        assert "sw02001-A" in d.wav_scp and "sw02001-B" in d.wav_scp
        assert "-c 1" in d.wav_scp["sw02001-A"]
        assert "-c 2" in d.wav_scp["sw02001-B"]
        utt = "sw02001-A_000050-000275"
        assert d.text[utt] == ["hello", "there"]
        assert d.segments[utt] == ("sw02001-A", 0.5, 2.75)
        assert d.utt2spk[utt] == "sw02001-A"
        # empty-after-filter utterance dropped
        assert len(d.text) == 1


class TestHkust:
    def test_prep(self, tmp_path):
        audio = tmp_path / "audio"
        trans = tmp_path / "trans"
        _touch(str(audio / "audio" / "dev" / "xx0001.sph"), b"")
        gbk_line = "0.50 2.20 A: " + "你好".encode().decode()
        content = ("# xx0001\n" + gbk_line + " 世界\n").encode("gbk")
        _touch(str(trans / "trans" / "dev" / "xx0001.txt"), content)
        dirs = hkust_prep(str(audio), str(trans), str(tmp_path / "data"))
        d = dirs["dev"]
        utt = "xx0001-A-000050-000220"
        assert d.text[utt] == ["你好", "世界"]
        assert d.segments[utt] == ("xx0001-A", 0.5, 2.2)
        assert "-c 1" in d.wav_scp["xx0001-A"]


class TestPrepCorpusCLI:
    def test_librispeech_cli(self, tmp_path):
        from eesen_tpu.io.datadir import DataDir
        from eesen_tpu.tools.cli import main

        src = tmp_path / "train-clean-100"
        _touch(str(src / "19" / "198" / "19-198.trans.txt"),
               "19-198-0000 HELLO WORLD\n")
        _touch(str(src / "19" / "198" / "19-198-0000.flac"), b"")
        dst = str(tmp_path / "data")
        assert main(["prep-corpus", "librispeech", dst, str(src)]) == 0
        d = DataDir(dst)
        assert d.text["19-198-0000"] == ["HELLO", "WORLD"]
