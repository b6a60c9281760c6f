"""Driver-contract tests: entry() compiles (tiny proxy), dryrun_multichip runs."""

import numpy as np


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)
    ge.dryrun_multichip(1)


def test_finetune_step_learns(rng):
    """Fine-tune loss decreases over a few steps on a tiny separable task."""
    import jax.numpy as jnp

    from stutter_tpu.models import WavLMConfig
    from stutter_tpu.train.finetune import FinetuneConfig, FinetuneTrainer

    cfg = FinetuneConfig(
        model=WavLMConfig.tiny(hidden_size=32, layers=2, heads=4),
        n_classes=2, head_hidden=(16,), activation_dtype=jnp.float32,
        head_lr=5e-3, backbone_lr=1e-4,
    )
    trainer = FinetuneTrainer(cfg)
    # two classes = two very different tones
    t = np.arange(3200) / 16000.0
    waves = np.stack(
        [np.sin(2 * np.pi * 200 * t)] * 4 + [np.sin(2 * np.pi * 2000 * t)] * 4
    ).astype(np.float32)
    lengths = np.full((8,), 3200, np.int32)
    labels = np.array([0] * 4 + [1] * 4, np.int32)
    cw = np.ones(2, np.float32)

    losses = [trainer.step(waves, lengths, labels, cw)["loss"] for _ in range(12)]
    assert losses[-1] < losses[0], losses
    preds = trainer.predict(waves, lengths)
    assert (preds == labels).mean() >= 0.75
