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
