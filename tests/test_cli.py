"""CLI smoke tests: reference-compatible flags drive the full pipelines."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from stutter_tpu.audio.synthetic import make_synthetic_corpus

    root = str(tmp_path_factory.mktemp("corpus"))
    # short clips on purpose: the monkeypatched tiny stem downsamples 20x,
    # so CPU attention cost scales with (20 * duration)^2 — 0.9 s clips keep
    # L <= 720 where the old (0.5, 3.0) range meant L up to 2400 and made
    # the finetune CLI smokes the slowest tests in the suite
    make_synthetic_corpus(root, n_per_split={"train": 10, "test": 4, "devel": 4},
                          seed=5, duration_range=(0.3, 0.9))
    return root


def test_extract_wavlm_cli(corpus, tmp_path, monkeypatch):
    """--random_init smoke run with a tiny architecture (monkeypatched preset)."""
    import stutter_tpu.cli.common as common
    from stutter_tpu.models import WavLMConfig

    monkeypatch.setattr(
        WavLMConfig, "base", staticmethod(lambda: WavLMConfig.tiny(32, 2, 4))
    )
    from stutter_tpu.cli.extract_wavlm import main

    out = str(tmp_path / "emb" / "wavlm")
    rc = main([
        "--data_dir", corpus, "--output_dir", out,
        "--model_name", "microsoft/wavlm-base", "--random_init",
        "--audio_budget", "32", "--checkpoint_interval", "6",
    ])
    assert rc == 0
    for split in ("train", "test", "devel"):
        assert os.path.exists(os.path.join(out, split, "embedding_metadata.csv"))
        npys = [f for f in os.listdir(os.path.join(out, split)) if f.endswith(".npy")]
        assert len(npys) == 3  # tiny model: (2,1,0,1) dedupes to 3

    # and train on it through the CLI
    from stutter_tpu.cli.train import main as train_main

    results = str(tmp_path / "results")
    rc = train_main([
        "--embeddings_dir", str(tmp_path / "emb"), "--results_dir", results,
        "--model_type", "wavlm", "--classifier", "linear",
        "--no_augmentation", "--smote_k_neighbors", "2", "--head_epochs", "25",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(results, "final_summary.txt"))
    assert os.path.exists(os.path.join(results, "all_results_comparison.csv"))


def test_extract_whisper_cli(corpus, tmp_path, monkeypatch):
    from stutter_tpu.models import WhisperConfig

    monkeypatch.setattr(
        WhisperConfig, "base",
        staticmethod(lambda: WhisperConfig.tiny(d_model=32, layers=2, heads=4)),
    )
    from stutter_tpu.cli.extract_whisper import main

    out = str(tmp_path / "emb" / "whisper")
    rc = main([
        "--data_dir", corpus, "--output_dir", out,
        "--model_name", "openai/whisper-base", "--random_init",
        "--batch_size", "8", "--split", "devel",
    ])
    assert rc == 0
    files = os.listdir(os.path.join(out, "devel"))
    enc = [f for f in files if f.startswith("encoder_layer_")]
    dec = [f for f in files if f.startswith("decoder_layer_")]
    assert len(enc) == 3 and len(dec) == 3
    arr = np.load(os.path.join(out, "devel", enc[0]))
    assert arr.shape == (4, 32) and np.isfinite(arr).all()


def test_train_cli_rejects_unimplemented(tmp_path):
    from stutter_tpu.cli.train import main

    rc = main([
        "--embeddings_dir", str(tmp_path), "--results_dir", str(tmp_path / "r"),
        "--model_type", "bestrq",
    ])
    assert rc == 2


def test_grid_cli_bool_flags():
    from stutter_tpu.cli.train_grid import parse_args

    args = parse_args([
        "--embeddings_dir", "e", "--results_dir", "r",
        "--use_smote", "False", "--no_augmentation",
    ])
    assert args.use_smote is False  # reference's type=bool bug fixed
    assert args.use_augmentation is False
    assert args.use_class_weights is True


def test_extract_wavlm_cli_tp(corpus, tmp_path, monkeypatch):
    """Full CLI path with an explicit DP x TP mesh (--devices 4 --tp 2) on
    the virtual 8-CPU mesh: build_mesh -> TP-sharded extractor -> store."""
    from stutter_tpu.models import WavLMConfig

    monkeypatch.setattr(
        WavLMConfig, "base", staticmethod(lambda: WavLMConfig.tiny(64, 2, 4))
    )
    from stutter_tpu.cli.extract_wavlm import main

    out = str(tmp_path / "emb_tp" / "wavlm")
    rc = main([
        "--data_dir", corpus, "--output_dir", out,
        "--model_name", "microsoft/wavlm-base", "--random_init",
        "--devices", "4", "--tp", "2", "--audio_budget", "32",
    ])
    assert rc == 0
    for split in ("train", "test", "devel"):
        d = os.path.join(out, split)
        npys = [f for f in os.listdir(d) if f.endswith(".npy")]
        assert npys
        for f in npys:
            a = np.load(os.path.join(d, f))
            assert np.isfinite(a).all() and a.shape[1] == 64


def test_finetune_cli(corpus, tmp_path, monkeypatch):
    """End-to-end fine-tune CLI smoke: trains with the valid-row mask (pad
    rows excluded from loss) and writes results + model artifacts.

    --devices 2 keeps a real DP mesh (sharded batch + grad psum) while
    bounding the collective to 2 participants: XLA:CPU's rendezvous
    spin-waits, so on this 1-core host an 8-way all-reduce whose per-device
    portion is a full fwd+bwd step accumulates ~70 s arrival skew and trips
    the ~90 s fatal termination timeout (observed SIGABRT in
    InProcessCommunicator::AllReduce). 8-device coverage stays in
    test_graft_entry/dryrun_multichip and tests/test_parallel.py, whose
    per-device programs are small enough to rendezvous promptly."""
    from stutter_tpu.models import WavLMConfig

    monkeypatch.setattr(
        WavLMConfig, "base", staticmethod(lambda: WavLMConfig.tiny(32, 2, 4))
    )
    from stutter_tpu.cli.finetune import main

    results = str(tmp_path / "ft_results")
    rc = main([
        "--data_dir", corpus, "--results_dir", results,
        "--model_name", "microsoft/wavlm-base", "--random_init",
        "--epochs", "1", "--batch_size", "8", "--max_length", "1.0",
        "--devices", "2",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(results, "finetune_results.json"))
    saved = [f for f in os.listdir(results) if f.endswith((".joblib", ".json"))]
    assert saved


def test_finetune_cli_grad_accum(corpus, tmp_path, monkeypatch):
    """--grad_accum groups same-bucket batches into accumulated updates
    (numerics pinned by tests/test_grad_accum.py; this covers the CLI's
    shape-grouping + tail-padding plumbing). --devices 1: the accum loop is
    device-count-independent and single-device avoids the CPU-host collective
    rendezvous cost documented on test_finetune_cli. --int8_forward rides
    along so the r5 flag is exercised through the CLI surface (step
    numerics pinned by tests/test_quant.py + tests/test_grad_accum.py)."""
    from stutter_tpu.models import WavLMConfig

    monkeypatch.setattr(
        WavLMConfig, "base", staticmethod(lambda: WavLMConfig.tiny(32, 2, 4))
    )
    from stutter_tpu.cli.finetune import main

    results = str(tmp_path / "ft_accum_results")
    rc = main([
        "--data_dir", corpus, "--results_dir", results,
        "--model_name", "microsoft/wavlm-base", "--random_init",
        "--epochs", "1", "--batch_size", "4", "--max_length", "1.0",
        "--devices", "1", "--grad_accum", "2", "--no_remat",
        "--int8_forward",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(results, "finetune_results.json"))


def test_finetune_cli_checkpoint_resume(corpus, tmp_path, monkeypatch):
    """--checkpoint_dir saves orbax train state per epoch; --resume restarts
    from the latest epoch (same flags as the grad-accum smoke so the jit
    programs are shared through the persistent compile cache)."""
    from stutter_tpu.models import WavLMConfig

    monkeypatch.setattr(
        WavLMConfig, "base", staticmethod(lambda: WavLMConfig.tiny(32, 2, 4))
    )
    from stutter_tpu.cli.finetune import main

    results = str(tmp_path / "ft_ckpt_results")
    ckpt = str(tmp_path / "ft_ckpt")
    common = [
        "--data_dir", corpus, "--results_dir", results,
        "--model_name", "microsoft/wavlm-base", "--random_init",
        "--batch_size", "4", "--max_length", "1.0",
        "--devices", "1", "--grad_accum", "2", "--no_remat",
        "--checkpoint_dir", ckpt,
    ]
    assert main(common + ["--epochs", "1"]) == 0
    assert os.path.isdir(os.path.join(ckpt, "step_00000001"))

    # resume continues at epoch 1 and saves epoch 2's state
    assert main(common + ["--epochs", "2", "--resume"]) == 0
    assert os.path.isdir(os.path.join(ckpt, "step_00000002"))
    assert os.path.exists(os.path.join(results, "finetune_results.json"))


def test_extract_wavlm_cli_turbo_preset(corpus, tmp_path, monkeypatch):
    """--preset turbo drives the int8 path through the full CLI contract."""
    from stutter_tpu.models import WavLMConfig

    monkeypatch.setattr(
        WavLMConfig, "base", staticmethod(lambda: WavLMConfig.tiny(32, 2, 4))
    )
    from stutter_tpu.cli.extract_wavlm import main

    out = str(tmp_path / "emb_turbo" / "wavlm")
    rc = main([
        "--data_dir", corpus, "--output_dir", out,
        "--model_name", "microsoft/wavlm-base", "--random_init",
        "--preset", "turbo", "--split", "train", "--audio_budget", "32",
    ])
    assert rc == 0
    import numpy as np

    npys = [f for f in os.listdir(os.path.join(out, "train")) if f.endswith(".npy")]
    assert len(npys) == 3
    for f in npys:
        assert np.isfinite(np.load(os.path.join(out, "train", f))).all()


def test_make_bucket_batcher_honors_extractor_preferences():
    """The serve/predict shared constructor (cli/common.make_bucket_batcher):
    extractor preferred_buckets win unless the caller names buckets, mesh data
    size becomes the batch multiple, and frame_align rides through."""
    from types import SimpleNamespace

    from stutter_tpu.cli.common import make_bucket_batcher
    from stutter_tpu.extract.batcher import DEFAULT_BUCKETS_S

    ex = SimpleNamespace(preferred_buckets=(30.0,), frame_align=(10, 5, 16))
    mesh = SimpleNamespace(data_size=4)

    b = make_bucket_batcher(ex, mesh, audio_budget_s=60.0, max_batch=8)
    assert b.buckets_s == (30.0,)
    assert b.batch_multiple == 4
    assert b.frame_align == (10, 5, 16)

    # explicit buckets override the extractor's preference
    b2 = make_bucket_batcher(ex, None, buckets_s=(2.0, 4.0),
                             audio_budget_s=16.0, max_batch=8,
                             max_length_s=12.0)
    # (max_length_s joins the ladder as the trim bucket)
    assert b2.buckets_s == (2.0, 4.0, 12.0)
    assert b2.batch_multiple == 1

    # an extractor with no preferences falls back to the defaults
    plain = SimpleNamespace()
    b3 = make_bucket_batcher(plain, None, audio_budget_s=16.0, max_batch=8)
    assert b3.buckets_s == tuple(sorted(DEFAULT_BUCKETS_S))
