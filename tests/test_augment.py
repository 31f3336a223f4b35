"""Multi-warp VTLN + multi-rate augmentation flow
(run_nml_seq_fw_seq_tw.sh:92-150, steps/train_ctc_parallel_mult.sh)."""

import numpy as np
import pytest

from eesen_tpu.recipes.augment import (
    LIBRISPEECH_ROTATION, AugmentTag, base_tag, librispeech_tags,
    rotation_tag,
)


def test_tag_set_matches_reference():
    tags = librispeech_tags()
    names = {t.name for t in tags}
    # 3 shifts x 3 warps, every rotation entry resolvable
    assert len(tags) == 9
    assert set(LIBRISPEECH_ROTATION) == names
    # canonical view appears twice per 10-epoch cycle (reference --tags)
    assert LIBRISPEECH_ROTATION.count("10_1") == 2
    assert len(LIBRISPEECH_ROTATION) == 10


def test_rotation_is_reference_epoch_mapping():
    order = ["a", "b", "c"]
    # train_tag_idx = (iter-1) % n, 1-based epochs
    assert [rotation_tag(order, e) for e in (1, 2, 3, 4, 7)] == [
        "a", "b", "c", "a", "a"
    ]


def test_base_tag():
    assert base_tag(librispeech_tags()).name == "10_1"


@pytest.fixture(scope="module")
def tiny_data():
    from eesen_tpu.io.datadir import DataDir

    class Mem:
        pass

    rng = np.random.default_rng(0)
    d = Mem()
    d.wav_scp = {
        f"u{i}": (rng.standard_normal(8000) * 3000).astype(np.float32)
        for i in range(3)
    }
    d.text = {k: ["w"] for k in d.wav_scp}
    d.utt2spk = {k: "s0" for k in d.wav_scp}
    return d


def _tiny_run(tmp_path):
    from eesen_tpu.decoder.beam import BeamSearchConfig
    from eesen_tpu.frontend.features import (
        FbankOptions, FrameOptions, MelOptions,
    )
    from eesen_tpu.frontend.pipeline import FeaturePipelineConfig
    from eesen_tpu.models.model import AcousticModelConfig
    from eesen_tpu.recipes.config import RecipeConfig
    from eesen_tpu.recipes.run import RecipeRun
    from eesen_tpu.training.batching import BatchConfig
    from eesen_tpu.training.optim import OptimizerConfig
    from eesen_tpu.training.schedule import NewbobConfig

    cfg = RecipeConfig(
        name="aug", dict_type="phn",
        fbank=FbankOptions(
            frame_opts=FrameOptions(dither=0.0),
            mel_opts=MelOptions(num_bins=8),
        ),
        pipeline=FeaturePipelineConfig(norm_vars=False, delta_order=0),
        model=AcousticModelConfig(
            input_dim=8, cell_dim=8, num_layers=1, num_targets=-1,
        ),
        optimizer=OptimizerConfig(algorithm="sgd"),
        newbob=NewbobConfig(learn_rate=0.01, max_iters=3, min_iters=3),
        batch=BatchConfig(num_sequence=4, time_quant=32),
        decode=BeamSearchConfig(),
    )
    lexicon = [("w", ("aa", "bb")), ("<UNK>", ("aa",))]
    return RecipeRun(cfg, str(tmp_path / "work"), lexicon, ["aa", "bb"])


def test_compute_augmented_features(tmp_path, tiny_data):
    run = _tiny_run(tmp_path)
    run.build_lang()
    tagged = run.compute_augmented_features(tiny_data)
    assert set(tagged) == {t.name for t in librispeech_tags()}
    f8 = tagged["8_1"]["u0"]
    f10 = tagged["10_1"]["u0"]
    f11 = tagged["11_1"]["u0"]
    # smaller frame shift -> more frames (speed-perturbation emulation)
    assert f8.shape[0] > f10.shape[0] > f11.shape[0]
    assert f8.shape[1] == f10.shape[1]
    # VTLN warp changes the values, not the shape
    w08 = tagged["10_0.8"]["u0"]
    assert w08.shape == f10.shape
    assert not np.allclose(w08, f10)


@pytest.mark.slow
def test_train_rotates_tags(tmp_path, tiny_data, monkeypatch):
    import eesen_tpu.recipes.augment as aug

    run = _tiny_run(tmp_path)
    run.build_lang()
    labels = run.prep_labels(tiny_data)
    tagged = run.compute_augmented_features(tiny_data)
    cv = tagged["10_1"]
    picked = []
    orig = aug.rotation_tag

    def spy(order, epoch):
        tag = orig(order, epoch)
        picked.append((epoch, tag))
        return tag

    monkeypatch.setattr(aug, "rotation_tag", spy)
    run.train(
        cv, labels, cv, labels,
        tagged_feats=tagged, tag_order=["8_1", "10_1", "11_1"],
        epochs_batches_repeat=2,
    )
    assert picked[:3] == [(1, "8_1"), (2, "10_1"), (3, "11_1")]


def test_fit_passes_epoch_only_when_wanted():
    """Trainer.fit keeps supporting zero-arg batch sources."""
    import inspect

    def zero():
        return iter(())

    def one(epoch):
        return iter(())

    assert not bool(inspect.signature(zero).parameters)
    assert bool(inspect.signature(one).parameters)
