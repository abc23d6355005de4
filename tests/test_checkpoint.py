"""Orbax checkpoint save/auto-resume (SURVEY.md §5: the reference's
tf.train.Saver periodic save + latest_checkpoint restore)."""

import jax
import jax.numpy as jnp
import numpy as np

from dpcx.config import Config
from dpcx.train import (
    _checkpoint_manager,
    create_state,
    restore_checkpoint,
    save_checkpoint,
)

TINY = Config(
    vox_size=8,
    pc_num_points=32,
    image_size=16,
    encoder_filters=(4,),
    latent_dim=16,
    fc_hidden=16,
    pc_decoder_hidden=(16,),
)


def test_save_restore_roundtrip(tmp_path):
    cfg = TINY.replace(checkpoint_dir=str(tmp_path / "run"))
    state = create_state(cfg, jax.random.PRNGKey(0))
    state = state.replace(step=jnp.asarray(42))
    mngr = _checkpoint_manager(cfg)
    save_checkpoint(mngr, state)
    mngr.wait_until_finished()

    fresh = create_state(cfg, jax.random.PRNGKey(1))
    restored = restore_checkpoint(_checkpoint_manager(cfg), fresh)
    assert int(restored.step) == 42
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(restored.params)
    ):
        np.testing.assert_allclose(a, b)


def test_restore_noop_without_checkpoint(tmp_path):
    cfg = TINY.replace(checkpoint_dir=str(tmp_path / "empty"))
    state = create_state(cfg, jax.random.PRNGKey(0))
    restored = restore_checkpoint(_checkpoint_manager(cfg), state)
    assert int(restored.step) == 0


def test_resume_is_bit_reproducible(tmp_path):
    """Data randomness is a pure function of (seed, step): training 3+3
    steps through a checkpoint restore produces EXACTLY the params of an
    uninterrupted 6-step run (VERDICT r2 weak 7)."""
    from dpcx.data.dataset import Dataset
    from dpcx.data.synthetic import make_dataset
    from dpcx.train import train

    def run(ckpt_dir, stops):
        cfg = TINY.replace(
            checkpoint_dir=str(tmp_path / ckpt_dir),
            num_views=2,
            views_per_step=2,
            batch_size=2,
            save_every=3,
            log_every=3,
            pc_point_dropout=1.0,
        )
        ds = Dataset(make_dataset(cfg, 3, seed=0, gt_points=64), cfg)
        state = None
        for s in stops:
            state, _ = train(cfg, dataset=ds, max_steps=s)
        return state

    straight = run("straight", [6])
    resumed = run("resumed", [3, 6])
    assert int(straight.step) == int(resumed.step) == 6
    for a, b in zip(
        jax.tree.leaves(straight.params), jax.tree.leaves(resumed.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_semantic_flag_mismatch_rejected(tmp_path):
    """A run dir records its pose-semantics flags; resuming or evaluating
    with a different pose_candidate_offsets raises instead of silently
    rotating the candidates (ADVICE r2)."""
    import pytest

    from dpcx.train import record_and_check_run_config

    cfg = TINY.replace(
        checkpoint_dir=str(tmp_path / "run"),
        predict_pose=True,
        pose_candidate_offsets=True,
    )
    record_and_check_run_config(cfg)  # records
    record_and_check_run_config(cfg)  # same flags: fine
    with pytest.raises(ValueError, match="pose_candidate_offsets"):
        record_and_check_run_config(
            cfg.replace(pose_candidate_offsets=False)
        )
    # verify-only mode never creates the file
    cfg2 = TINY.replace(checkpoint_dir=str(tmp_path / "other"))
    record_and_check_run_config(cfg2, write=False)
    assert not (tmp_path / "other" / "config.yaml").exists()
