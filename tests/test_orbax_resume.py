"""Exact-resume training via the orbax CheckpointManager backend.

Claim under test: a run interrupted after epoch k and resumed from the
orbax full-state checkpoint (params + batch_stats + opt_state + step)
reproduces the uninterrupted run bit-for-bit — i.e. the Adam moments, the
schedule position, the step counter AND the batch order all survive the
roundtrip.  The reference cannot do this: its snapshots are bare
state_dicts (trainer.py:256-261) and its `resume` config key is dead
(configs/KITTI_train_IGRs.yml:156).
"""

import os

import numpy as np
import pytest
import jax

from egonet_tpu.config import load_config
from egonet_tpu.data import kitti
from tests import fixtures


def _cfg(root):
    here = os.path.join(os.path.dirname(__file__), "..", "egonet_tpu",
                        "configs")
    cfg = load_config(os.path.join(here, "KITTI_train_IGRs.yml"))
    cfg["dataset"]["root"] = root
    fixtures.shrink_hrnet(cfg)
    cfg["heatmapModel"]["pretrained"] = ""
    cfg["training_settings"]["batch_size"] = 1
    cfg["training_settings"]["eval_during"] = False
    return cfg


@pytest.fixture(scope="module")
def records_and_cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("orbax")
    root, _ = fixtures.make_kitti_root(tmp, n_images=2)
    cfg = _cfg(root)
    ds = kitti.KITTIDataset(cfg, "train")
    return ds.records, cfg


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def test_igr_full_state_roundtrip(records_and_cfg, tmp_path):
    """Cheap default-suite proof: one epoch, save, restore into a fresh
    template — every leaf (incl. Adam moments and step) survives."""
    from egonet_tpu.train.igrs import IGRTrainer
    from egonet_tpu.io.orbax_ckpt import TrainCheckpointManager
    records, cfg = records_and_cfg
    trainer = IGRTrainer(cfg)
    with TrainCheckpointManager(str(tmp_path / "rt"),
                                async_save=False) as mgr:
        state, _ = trainer.fit(records, epochs=1, seed=7, ckpt_manager=mgr)
        assert mgr.latest_step() == 1
        restored = mgr.restore(trainer.init_state(0), step=1)
    for got, want in zip(_leaves(restored), _leaves(state)):
        np.testing.assert_array_equal(got, want)
    assert int(restored.step) == int(state.step) and int(state.step) > 0


@pytest.mark.skipif(
    not os.environ.get("EGONET_SLOW_TESTS"),
    reason="trains three IGR trainers (~5 min CPU); EGONET_SLOW_TESTS=1")
def test_exact_resume_matches_uninterrupted(records_and_cfg, tmp_path):
    from egonet_tpu.train.igrs import IGRTrainer
    from egonet_tpu.io.orbax_ckpt import TrainCheckpointManager
    records, cfg = records_and_cfg
    seed = 7

    # ---- uninterrupted run: 3 epochs, manager saving each epoch --------
    trainer = IGRTrainer(cfg)
    with TrainCheckpointManager(str(tmp_path / "a"),
                                async_save=False) as mgr_a:
        state_a, _ = trainer.fit(records, epochs=3, seed=seed,
                                 ckpt_manager=mgr_a)
        assert mgr_a.latest_step() == 3

    # ---- interrupted run: 2 epochs, then resume from the orbax dir -----
    trainer_b = IGRTrainer(cfg)
    dir_b = str(tmp_path / "b")
    with TrainCheckpointManager(dir_b, async_save=False) as mgr_b:
        state_mid, _ = trainer_b.fit(records, epochs=2, seed=seed,
                                     ckpt_manager=mgr_b)

    # fresh manager + fresh trainer, as a restarted process would build
    trainer_c = IGRTrainer(cfg)
    with TrainCheckpointManager(dir_b, async_save=False) as mgr_c:
        latest = mgr_c.latest_step()
        assert latest == 2
        template = trainer_c.init_state(0)
        restored = mgr_c.restore(template, step=latest)

        # the FULL state survived: params, batch_stats, opt_state (Adam
        # moments), step — not just the weights
        for got, want in zip(_leaves(restored), _leaves(state_mid)):
            np.testing.assert_array_equal(got, want)
        assert int(restored.step) == int(state_mid.step)

        state_c, _ = trainer_c.fit(records, epochs=3, seed=seed,
                                   state=restored, ckpt_manager=mgr_c,
                                   start_epoch=latest)

    # resumed trajectory == uninterrupted trajectory, bitwise
    for got, want in zip(_leaves(state_c), _leaves(state_a)):
        np.testing.assert_array_equal(got, want)
    assert int(state_c.step) == int(state_a.step)


def _lifter_setup(igr_cfg):
    here = os.path.join(os.path.dirname(__file__), "..", "egonet_tpu",
                        "configs")
    cfg = load_config(os.path.join(here, "KITTI_train_lifting.yml"))
    cfg["dataset"]["root"] = igr_cfg["dataset"]["root"]
    cfg["training_settings"].update({"total_epochs": 4, "batch_size": 4,
                                     "lft_aug_times": 3})
    train_set, _ = kitti.prepare_data(cfg)
    cfg["FCModel"]["input_size"] = int(train_set.input.shape[1])
    cfg["FCModel"]["output_size"] = int(train_set.output.shape[1])
    cfg["FCModel"]["num_neurons"] = 32
    return cfg, train_set


def test_lifter_exact_resume(records_and_cfg, tmp_path):
    from egonet_tpu.train.lifting import LiftingTrainer
    from egonet_tpu.io.orbax_ckpt import TrainCheckpointManager
    _, igr_cfg = records_and_cfg
    cfg, train_set = _lifter_setup(igr_cfg)

    with TrainCheckpointManager(str(tmp_path / "la"),
                                async_save=False) as mgr:
        state_a, _ = LiftingTrainer(cfg).fit(train_set, epochs=4, seed=3,
                                             ckpt_manager=mgr)

    dir_b = str(tmp_path / "lb")
    with TrainCheckpointManager(dir_b, async_save=False) as mgr:
        LiftingTrainer(cfg).fit(train_set, epochs=2, seed=3,
                                ckpt_manager=mgr)
    tr = LiftingTrainer(cfg)
    with TrainCheckpointManager(dir_b, async_save=False) as mgr:
        restored = mgr.restore(tr.init_state(0), step=mgr.latest_step())
        state_b, _ = tr.fit(train_set, epochs=4, seed=3, state=restored,
                            ckpt_manager=mgr, start_epoch=2)
    for got, want in zip(_leaves(state_b), _leaves(state_a)):
        np.testing.assert_array_equal(got, want)


def test_async_save_survives_buffer_donation(records_and_cfg, tmp_path):
    """The shipped default is async_save=True (tools/train_igrs.py), and
    the train steps donate the state buffers (donate_argnums=(0,)): a save
    that deferred its device->host copy would read buffers the NEXT step
    has already overwritten.  Save async, keep training immediately, then
    restore the saved step and compare to a host snapshot taken at save
    time (ADVICE r3)."""
    from egonet_tpu.train.lifting import LiftingTrainer
    from egonet_tpu.io.orbax_ckpt import TrainCheckpointManager
    _, igr_cfg = records_and_cfg
    cfg, train_set = _lifter_setup(igr_cfg)
    tr = LiftingTrainer(cfg)
    state = tr.init_state(3)
    from egonet_tpu.data.loader import ArrayBatchLoader
    loader = ArrayBatchLoader(train_set.input, train_set.output, 4, seed=3)
    rng = jax.random.PRNGKey(4)
    for batch in loader.epoch():
        state, _ = tr.train_step(state, batch, rng)
    snap = _leaves(state)                 # host truth at save time
    with TrainCheckpointManager(str(tmp_path / "async"),
                                async_save=True) as mgr:
        mgr.save(1, state)
        # donate the just-saved buffers while the save may be in flight
        for batch in loader.epoch():
            state, _ = tr.train_step(state, batch, rng)
        mgr.wait_until_finished()
        restored = mgr.restore(tr.init_state(0), step=1)
    for got, want in zip(_leaves(restored), snap):
        np.testing.assert_array_equal(got, want)


def test_restore_without_checkpoints_raises(tmp_path):
    from egonet_tpu.io.orbax_ckpt import TrainCheckpointManager
    with TrainCheckpointManager(str(tmp_path / "empty")) as mgr:
        assert mgr.latest_step() is None
        with pytest.raises(FileNotFoundError):
            mgr.restore(template={"x": np.zeros(3)})
