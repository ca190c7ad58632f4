"""Training engine: jitted train step + epoch loop.

Parity with the reference trainer
(/root/reference/maskrcnn_benchmark/engine/trainer_sparse3d.py:42-172):
per-iteration LR schedule, NaN-loss guard (skip step), windowed metric
logging with ETA, min-loss + periodic checkpoints. The reference's
autograd.detect_anomaly becomes a jnp.isfinite check on the loss (and an
optional debug flag for per-leaf gradient checks).

The whole optimizer step (forward + backward + SGD update) is ONE jitted
function; data feeding converts host scenes to padded device arrays.
"""

from __future__ import annotations

import functools
import logging
import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from detection_3d_tpu.config.defaults import Config
from detection_3d_tpu.engine.solver import make_optimizer
from detection_3d_tpu.models.detector import SparseRCNN, voxelize_points
from detection_3d_tpu.models.structures import Boxes3D
from detection_3d_tpu.utils.checkpoint import Checkpointer
from detection_3d_tpu.utils.metric_logger import MetricLogger

_LOG = logging.getLogger(__name__)


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def pad_scene(cfg: Config, scene: Dict) -> Dict[str, np.ndarray]:
    """Host-side: pad a scene dict to the static capacities.

    Warns when the scene exceeds a capacity and is truncated — the
    reference tolerates dropped points only via an explicit flag
    (suncg_dataset.py:18,160-168 ENABLE_POINTS_MISSED); silent loss of
    input is never acceptable.
    """
    n = cfg.caps.max_points
    pts = np.zeros((n, 3), np.float32)
    fts = np.zeros((n, cfg.in_channels), np.float32)
    m = min(scene["points"].shape[0], n)
    if scene["points"].shape[0] > n:
        _LOG.warning(
            "pad_scene: %d points exceed caps.max_points=%d — dropping "
            "%.1f%% of the input (raise caps.max_points)",
            scene["points"].shape[0], n,
            100.0 * (1 - n / scene["points"].shape[0]))
    pts[:m] = scene["points"][:m]
    fts[:m] = scene["feats"][:m, :cfg.in_channels]
    pvalid = np.arange(n) < m

    g = cfg.caps.max_gt
    gtb = np.zeros((g, 7), np.float32)
    gtb[:, 3:6] = 0.1  # harmless nonzero sizes on padding rows
    gtl = np.zeros((g,), np.int32)
    mg = min(scene["gt_boxes"].shape[0], g)
    gtb[:mg] = scene["gt_boxes"][:mg]
    gtl[:mg] = scene["gt_labels"][:mg]
    gvalid = np.arange(g) < mg
    if scene["gt_boxes"].shape[0] > g:
        _LOG.warning(
            "pad_scene: %d gt boxes exceed caps.max_gt=%d — dropping %d "
            "targets (raise caps.max_gt)",
            scene["gt_boxes"].shape[0], g, scene["gt_boxes"].shape[0] - g)
    return {"points": pts, "feats": fts, "points_valid": pvalid,
            "gt_boxes": gtb, "gt_labels": gtl, "gt_valid": gvalid}


def check_capacities(cfg: Config, scene: Dict, logger=None):
    """Build the full voxel pyramid for one scene and report per-scale
    true voxel counts vs the configured static capacities.

    Overflow at any scale means the input layer subsampled voxels (see
    ops/sparse.py build_sparse_tensor) — detection quality silently
    degrades, so run this once on a representative scene when choosing
    ``caps.voxel_caps``. Returns a list of (true_num, capacity) pairs.
    """
    from detection_3d_tpu.models.backbone import build_pyramid
    batch = pad_scene(cfg, scene)
    table = voxelize_points(cfg, jnp.asarray(batch["points"]),
                            jnp.asarray(batch["feats"]),
                            jnp.asarray(batch["points_valid"]))
    pyr = build_pyramid(table, cfg)
    out = []
    for k, t in enumerate(pyr["tables"]):
        tn, cap = int(t.true_num), t.capacity
        out.append((tn, cap))
        if tn > cap and logger:
            logger.warning(
                "scale %d: %d active voxels exceed capacity %d "
                "(subsampled %.0f%%) — raise caps.voxel_caps[%d]",
                k, tn, cap, 100.0 * (1 - cap / tn), k)
    return out


def cycle_pad(order: list, k: int) -> list:
    """Pad ``order`` to a multiple of ``k`` by cycling it. Correct even
    when the pad exceeds len(order) (k > n_scenes, e.g. a 4-scene run
    with scan_steps=10 — previously crashed the scan with mismatched
    leading axes)."""
    if len(order) % k:
        pad = k - len(order) % k
        order = order + (order * (pad // len(order) + 1))[:pad]
    return order


class Trainer:
    """Single-device or data-parallel training loop.

    Pass ``mesh`` (a 1-D ``jax.sharding.Mesh`` over a "dp" axis) to train
    data-parallel: each step consumes ``cfg.solver.ims_per_batch``
    buildings, sharded over the mesh (vmapped within a device), with
    pmean gradient reduction — the DDP analogue of the reference
    (train_net_sparse3d.py:52-57; SURVEY.md section 2.7).
    """

    def __init__(self, cfg: Config, output_dir: Optional[str] = None,
                 logger=None, mesh=None):
        self.cfg = cfg
        self.model = SparseRCNN(cfg)
        self.mesh = mesh
        self.logger = logger
        self.output_dir = output_dir or cfg.output_dir
        self.checkpointer = Checkpointer(self.output_dir, logger)
        self.meters = MetricLogger()
        self.min_loss = float("inf")
        self.min_save_every = 50
        self._last_min_save = -(10 ** 9)
        self.last_train_eval = None
        self._step_fn = None
        self._tx = None
        # non-finite steps a scene may contribute before it is culled
        # from the rotation (reference: curated SceneSamples.bad_scenes)
        self.bad_scene_strikes = 3
        # K > 1: run K train steps per device call (lax.scan) on the
        # single-device path — amortizes the host<->device round trip
        self.scan_steps = 1
        self._scan_fn = None

    def _persist_bad_scenes(self, names):
        """Write the culled blocklist to <output_dir>/bad_scenes.json —
        the file data/suncg.rm_bad_samples consumes."""
        import json
        path = os.path.join(self.output_dir, "bad_scenes.json")
        try:
            os.makedirs(self.output_dir, exist_ok=True)
            with open(path, "w") as f:
                json.dump(sorted(names), f)
        except OSError:          # pragma: no cover - best-effort persist
            if self.logger:
                self.logger.warning("could not write %s", path)

    # -- jitted pieces -----------------------------------------------------
    def init_state(self, example_scene: Dict, seed: int = 0,
                   iters_per_epoch: int = 1) -> TrainState:
        batch = pad_scene(self.cfg, example_scene)
        rng = jax.random.PRNGKey(seed)
        table = voxelize_points(self.cfg, jnp.asarray(batch["points"]),
                                jnp.asarray(batch["feats"]),
                                jnp.asarray(batch["points_valid"]))
        gt = Boxes3D(jnp.asarray(batch["gt_boxes"]),
                     jnp.asarray(batch["gt_valid"]))
        init_fn = jax.jit(functools.partial(self.model.init,
                                            is_train=True))
        params = init_fn(rng, table, gt, jnp.asarray(batch["gt_labels"]),
                         rng=rng)
        self._tx, self.lr_fn = make_optimizer(self.cfg, params,
                                              iters_per_epoch)
        opt_state = self._tx.init(params)
        return TrainState(params=params, opt_state=opt_state,
                          step=jnp.zeros((), jnp.int32))

    def _build_step(self):
        model, cfg, tx = self.model, self.cfg, self._tx

        def train_step(state: TrainState, batch, rng):
            table = voxelize_points(cfg, batch["points"], batch["feats"],
                                    batch["points_valid"])
            true_num = table.true_num
            gt = Boxes3D(batch["gt_boxes"], batch["gt_valid"])

            def loss_fn(params):
                losses, res = model.apply(params, table, gt,
                                          batch["gt_labels"],
                                          is_train=True, rng=rng)
                return sum(jax.tree_util.tree_leaves(losses)), (losses,
                                                                res)

            (total, (losses, res)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            # train-time predictions on non-GT proposals
            # (trainer_sparse3d.py:95-104); empty tuple when disabled
            dets = ()
            if cfg.eval_in_train:
                dets = (res.boxes, res.valid, res.fields["scores"],
                        res.fields["labels"])

            # NaN guard (trainer_sparse3d.py:86-91): skip the update when
            # the loss or ANY gradient is non-finite (params stay clean
            # even when the loss is finite but grads blew up).
            grads_ok = jax.tree_util.tree_reduce(
                lambda a, g: a & jnp.all(jnp.isfinite(g)), grads,
                jnp.bool_(True))
            ok = jnp.isfinite(total) & grads_ok
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            # Gate the WHOLE transition on ok: on a non-finite step
            # neither params nor momentum/wd buffers move — the
            # reference skips optimizer.step() entirely
            # (trainer_sparse3d.py:86-91).
            keep = lambda n, o: jnp.where(ok, n, o)
            new_params = jax.tree_util.tree_map(keep, new_params,
                                                state.params)
            new_opt = jax.tree_util.tree_map(keep, new_opt,
                                             state.opt_state)
            new_state = TrainState(params=new_params, opt_state=new_opt,
                                   step=state.step + 1)
            return new_state, total, losses, ok, true_num, dets

        self._step_body = train_step
        return jax.jit(train_step)

    def _build_scan_step(self):
        """K train steps per device call: `lax.scan` over pre-staged
        batches. The per-step host<->device round trip (tunnel latency +
        scalar fetches) dominates wall-clock at small scene sizes —
        scanning amortizes it K-fold. Single-device path only;
        eval-in-train epochs fall back to single steps (per-step
        detections would multiply the transfer instead)."""
        body = self._step_body

        @jax.jit
        def scan_steps(state: TrainState, batches, rngs):
            def f(st, xs):
                b, r = xs
                st2, total, losses, ok, tn, _ = body(st, b, r)
                return st2, (total, losses, ok, tn)
            return jax.lax.scan(f, state, (batches, rngs))

        return scan_steps

    def _build_batched_step(self):
        """DP train step: batch leaves (B, ...) sharded over the mesh's
        dp axis, vmap over the local buildings, pmean gradients."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        model, cfg, tx, mesh = self.model, self.cfg, self._tx, self.mesh

        def building_loss(params, batch, rng):
            table = voxelize_points(cfg, batch["points"], batch["feats"],
                                    batch["points_valid"])
            gt = Boxes3D(batch["gt_boxes"], batch["gt_valid"])
            losses, res = model.apply(params, table, gt,
                                      batch["gt_labels"],
                                      is_train=True, rng=rng)
            dets = ()
            if cfg.eval_in_train:
                dets = (res.boxes, res.valid, res.fields["scores"],
                        res.fields["labels"])
            return (sum(jax.tree_util.tree_leaves(losses)),
                    (losses, table.true_num, dets))

        def local_loss(params, batch, rng):
            # decorrelate sampling randomness across dp shards
            rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
            b = batch["points"].shape[0]
            keys = jax.random.split(rng, b)
            totals, (losses, tns, dets) = jax.vmap(
                lambda bt, k: building_loss(params, bt, k),
                in_axes=(0, 0))(batch, keys)
            return jnp.mean(totals), (
                jax.tree_util.tree_map(jnp.mean, losses), jnp.max(tns),
                dets)

        @jax.jit
        def train_step(state: TrainState, batch, rng):
            def sharded(params, batch):
                (total, (losses, tn, dets)), grads = jax.value_and_grad(
                    local_loss, has_aux=True)(params, batch, rng)
                # DP gradient all-reduce over ICI — the NCCL/DDP
                # analogue (SURVEY.md section 2.7)
                grads = jax.lax.pmean(grads, "dp")
                total = jax.lax.pmean(total, "dp")
                losses = jax.lax.pmean(losses, "dp")
                tn = jax.lax.pmax(tn, "dp")
                # eval-in-train detections: all-gather the per-shard
                # buildings so the host sees the whole batch — the
                # reference gathers train-eval across GPUs
                # (trainer_sparse3d.py:95-104 + utils/comm.py)
                dets = jax.tree.map(
                    lambda a: jax.lax.all_gather(a, "dp").reshape(
                        (-1,) + a.shape[1:]), dets)
                return total, losses, tn, grads, dets

            specs = jax.tree_util.tree_map(lambda _: P("dp"), batch)
            total, losses, true_num, grads, dets = shard_map(
                sharded, mesh=mesh, in_specs=(P(), specs),
                out_specs=(P(), P(), P(), P(), P()), check_vma=False)(
                    state.params, batch)

            grads_ok = jax.tree_util.tree_reduce(
                lambda a, g: a & jnp.all(jnp.isfinite(g)), grads,
                jnp.bool_(True))
            ok = jnp.isfinite(total) & grads_ok
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            keep = lambda n, o: jnp.where(ok, n, o)
            new_params = jax.tree_util.tree_map(keep, new_params,
                                                state.params)
            new_opt = jax.tree_util.tree_map(keep, new_opt,
                                             state.opt_state)
            new_state = TrainState(params=new_params, opt_state=new_opt,
                                   step=state.step + 1)
            return new_state, total, losses, ok, true_num, dets

        return train_step

    def _build_packed_step(self):
        """Train step over a host-packed pyramid batch: ALL
        input-dependent metadata (tables, conv/deconv/submanifold/BEV
        rulebooks, windowed relayouts) arrives precomputed
        (data/pyramid_packing.pack_pyramid) — the device runs only dense
        math, exactly like the inference fast path. The reference
        rebuilds its SCN Metadata hash tables inside EVERY training
        forward (SparseConvNet/sparseconvnet/SCN/Metadata/Metadata.cpp
        via trainer_sparse3d.py:69-121); here that work is done once per
        scene and cached (see train_resident)."""
        from detection_3d_tpu.data.pyramid_packing import unpack_pyramid

        model, cfg, tx = self.model, self.cfg, self._tx

        def train_step(state: TrainState, batch, rng):
            table, pyramid = unpack_pyramid(cfg, batch)
            gt = Boxes3D(batch["gt_boxes"], batch["gt_valid"])

            def loss_fn(params):
                losses, _ = model.apply(params, table, gt,
                                        batch["gt_labels"], is_train=True,
                                        rng=rng, pyramid=pyramid)
                return sum(jax.tree_util.tree_leaves(losses)), losses

            (total, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads_ok = jax.tree_util.tree_reduce(
                lambda a, g: a & jnp.all(jnp.isfinite(g)), grads,
                jnp.bool_(True))
            ok = jnp.isfinite(total) & grads_ok
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            keep = lambda n, o: jnp.where(ok, n, o)   # noqa: E731
            new_params = jax.tree_util.tree_map(keep, new_params,
                                                state.params)
            new_opt = jax.tree_util.tree_map(keep, new_opt,
                                             state.opt_state)
            new_state = TrainState(params=new_params, opt_state=new_opt,
                                   step=state.step + 1)
            return new_state, total, losses, ok

        return train_step

    def train_resident(self, scenes, state: TrainState, epochs: int,
                       seed: int = 0, chunk: int = 100,
                       checkpoint_every_chunks: int = 10):
        """Device-resident cached-metadata training — the gate fast path.

        Pack every scene's full pyramid metadata ONCE on the host (C++
        packer, data/native_packer.py), stack the packed scenes into one
        device-resident pytree (leading axis = n_scenes), then train as
        `lax.scan` chunks whose bodies INDEX the resident dataset: zero
        per-step host work and zero per-step H2D beyond a shuffled index
        vector. Steps/s is then bounded by fwd+bwd GEMM time alone.

        Requires the stacked dataset to fit HBM alongside params/opt
        (~15-25 MB/scene at the gate config). No eval-in-train or strike
        culling on this path; non-finite steps are skipped by the
        in-step NaN gate and counted.

        Mid-run RESUME: pass a ``state`` whose ``step`` is a chunk
        multiple (the periodic ``model_resident_last`` checkpoints are
        saved exactly there) and the loop deterministically re-derives
        the same shuffled order + rng stream from ``seed`` and skips the
        already-done chunks — a killed/stalled run continues where its
        last checkpoint left off (the TPU tunnel here drops for minutes
        at a time; see tools/generalization_check.py --resume-train).
        """
        from detection_3d_tpu.data.native_packer import pack_pyramid_native

        cfg = self.cfg
        scenes = list(scenes)
        n = len(scenes)
        t0 = time.time()
        packed = [pack_pyramid_native(cfg, s) for s in scenes]
        data = jax.device_put(
            {k: np.stack([p[k] for p in packed]) for k in packed[0]})
        if self.logger:
            sz = sum(v.nbytes for v in jax.tree_util.tree_leaves(data))
            self.logger.info(
                "train_resident: packed %d scenes in %.1fs "
                "(%.0f MB resident)", n, time.time() - t0, sz / 1e6)
        del packed

        if self._tx is None:
            raise RuntimeError("call init_state first")
        step_fn = self._build_packed_step()

        @jax.jit
        def run_chunk(state, idxs, rngs, data):
            def f(st, xs):
                i, r = xs
                b = jax.tree_util.tree_map(lambda a: a[i], data)
                st2, total, losses, ok = step_fn(st, b, r)
                return st2, (total, losses, ok)
            return jax.lax.scan(f, state, (idxs, rngs))

        rng = jax.random.PRNGKey(seed + 123)
        shuffle_rng = np.random.default_rng(seed + 77)
        start_step = int(state.step)
        if start_step % chunk:
            raise ValueError(
                f"resume step {start_step} is not a multiple of the "
                f"chunk size {chunk} — resume from a model_resident_last "
                "checkpoint (saved at chunk boundaries)")
        total_steps = epochs * n
        order = np.concatenate([shuffle_rng.permutation(n)
                                for _ in range(epochs)]).astype(np.int32)
        # cycle_pad handles pad > len(order) (e.g. 4 scenes x 10 epochs
        # with chunk=100); a plain tail-slice pad would leave len(order)
        # short of a chunk multiple and floor-truncate away ALL steps
        order = np.asarray(cycle_pad(list(order), chunk), dtype=np.int32)
        n_chunks = len(order) // chunk
        assert n_chunks * chunk >= total_steps
        if self.logger and len(order) > total_steps:
            self.logger.info(
                "train_resident: padded %d -> %d steps (chunk %d); the "
                "extra %d steps cycle the shuffled order",
                total_steps, len(order), chunk, len(order) - total_steps)
        t0 = time.time()
        start_chunk = start_step // chunk
        if self.logger and start_chunk:
            self.logger.info("train_resident: resuming at step %d "
                             "(chunk %d/%d)", start_step, start_chunk,
                             n_chunks)
        done = start_step
        skipped = 0
        for c in range(n_chunks):
            rng, sub = jax.random.split(rng)   # keep the stream aligned
            if c < start_chunk:
                continue
            idxs = jnp.asarray(order[c * chunk:(c + 1) * chunk])
            state, (totals, losses, oks) = run_chunk(
                state, idxs, jax.random.split(sub, chunk), data)
            totals = np.asarray(totals)   # one fetch per chunk
            oks = np.asarray(oks)
            done += chunk
            skipped += int((~oks).sum())
            mean_loss = float(np.nanmean(np.where(oks, totals, np.nan)))
            if self.logger:
                dt = (time.time() - t0) / max(done - start_step, 1)
                eta = dt * max(total_steps - done, 0)
                shown = min(done, total_steps)
                self.logger.info(
                    "resident step %d/%d epoch %d loss %.4f "
                    "(chunk mean %.4f) time %.4fs/step eta %.0fs%s",
                    shown, total_steps, shown // n, float(totals[-1]),
                    mean_loss, dt, eta,
                    f" SKIPPED {skipped} non-finite" if skipped else "")
            if np.isfinite(mean_loss) and mean_loss < self.min_loss:
                self.min_loss = mean_loss
                self.checkpointer.save("model_min_loss", {
                    "params": state.params, "opt_state": state.opt_state,
                    "step": state.step})
            if (c + 1) % checkpoint_every_chunks == 0:
                self.checkpointer.save("model_resident_last", {
                    "params": state.params, "opt_state": state.opt_state,
                    "step": state.step})
        if self.logger:
            ran = max(done - start_step, 1)
            self.logger.info("train_resident: %d steps in %.1fs "
                             "(%.4fs/step)", ran, time.time() - t0,
                             (time.time() - t0) / ran)
        return state

    # -- the loop ----------------------------------------------------------
    def train(self, scenes, state: TrainState,
              epochs: int, seed: int = 0,
              checkpoint_period_epochs: Optional[int] = None):
        """``scenes``: a list of scene dicts, or a loader object with
        ``.epoch(order)`` / ``__len__`` (data/native_loader.py — the C++
        thread-pool prefetcher; host IO then overlaps device steps)."""
        cfg = self.cfg
        source = scenes if hasattr(scenes, "epoch") else None
        if source is None:
            scenes = list(scenes)
        n_scenes = len(scenes)
        if self._step_fn is None:
            self._step_fn = (self._build_batched_step()
                             if self.mesh is not None
                             else self._build_step())
        bsz = 1
        if self.mesh is not None:
            dp = int(np.prod(self.mesh.devices.shape))
            # round up to a multiple of dp, matching tools/train_net.py's
            # iters_per_epoch computation (a valid ims_per_batch=6 on 4
            # devices must not crash)
            bsz = max(cfg.solver.ims_per_batch, dp)
            bsz += (-bsz) % dp
        ckpt_period = checkpoint_period_epochs or \
            cfg.solver.checkpoint_period_epochs
        rng = jax.random.PRNGKey(seed + 123)

        it = 0
        t_start = time.time()
        shuffle_rng = np.random.default_rng(seed + 77)
        steps_per_epoch = -(-n_scenes // bsz)
        # strike-based bad-scene culling: the runtime analogue of the
        # reference's curated blocklist (rm_bad_samples +
        # SceneSamples.bad_scenes, suncg_dataset.py:272-277). A scene
        # whose batch yields a non-finite step `bad_scene_strikes` times
        # is dropped from the rotation and persisted.
        strikes = np.zeros(n_scenes, np.int64)
        culled: set = set()
        culled_names: list = []
        for epoch in range(epochs):
            # eval-in-train accumulation (trainer_sparse3d.py:95-104,
            # 165-172): collect train-time predictions this epoch and
            # evaluate at epoch end
            eval_this_epoch = (cfg.eval_in_train > 0
                               and epoch % cfg.eval_in_train == 0)
            epoch_preds, epoch_gts = [], []
            # per-epoch shuffle (reference: DataLoader shuffle=True on
            # train, data3d/data.py:36)
            order = [i for i in shuffle_rng.permutation(n_scenes)
                     if i not in culled]
            if not order:
                raise RuntimeError(
                    "trainer: every scene was culled as bad "
                    f"({len(culled)} scenes with >= "
                    f"{self.bad_scene_strikes} non-finite steps)")
            order = cycle_pad(order, bsz)  # final-batch fill
            epoch_iter = iter(source.epoch(order)) if source else None
            # multi-step scanning (self.scan_steps = K > 1): K steps per
            # device call via lax.scan — the per-step host<->device round
            # trip dominates wall-clock on small scenes
            K = self.scan_steps
            use_scan = K > 1 and self.mesh is None and not eval_this_epoch
            if use_scan:
                order = cycle_pad(order, K)
            stride = K if use_scan else bsz
            for bstart in range(0, len(order), stride):
                if source:
                    group = [next(epoch_iter) for _ in range(stride)]
                else:
                    group = [scenes[i]
                             for i in order[bstart:bstart + stride]]
                padded = [pad_scene(cfg, s) for s in group]
                t0 = time.time()
                if use_scan:
                    if self._scan_fn is None:
                        self._scan_fn = self._build_scan_step()
                    batches = {k: jnp.asarray(
                        np.stack([p[k] for p in padded]))
                        for k in padded[0]}
                    rng, sub = jax.random.split(rng)
                    state, (tot_k, losses_k, ok_k, tn_k) = self._scan_fn(
                        state, batches, jax.random.split(sub, K))
                    # ONE device->host fetch for the whole chunk
                    tot_k, ok_k, tn_k = (np.asarray(x)
                                         for x in (tot_k, ok_k, tn_k))
                    losses_k = {k: np.asarray(v)
                                for k, v in losses_k.items()}
                    dt = (time.time() - t0) / K
                    results = [(float(tot_k[j]),
                                {k: float(v[j])
                                 for k, v in losses_k.items()},
                                bool(ok_k[j]), int(tn_k[j]), (),
                                order[bstart + j:bstart + j + 1], dt)
                               for j in range(K)]
                else:
                    if self.mesh is None:
                        batch = {k: jnp.asarray(v)
                                 for k, v in padded[0].items()}
                    else:
                        batch = {k: jnp.asarray(
                            np.stack([p[k] for p in padded]))
                            for k in padded[0]}
                    rng, key = jax.random.split(rng)
                    state, total, losses, ok, true_num, dets = \
                        self._step_fn(state, batch, key)
                    results = [(float(total),
                                {k: float(v) for k, v in losses.items()},
                                bool(ok), int(true_num), dets,
                                order[bstart:bstart + bsz],
                                time.time() - t0)]
                for total, losses, ok, true_num, dets, step_sids, dt \
                        in results:
                    self._book_step(
                        state, total, losses, ok, true_num, dets,
                        step_sids, dt, group, scenes, source, it, epoch,
                        epochs, steps_per_epoch, t_start,
                        eval_this_epoch, epoch_preds, epoch_gts,
                        strikes, culled, culled_names, n_scenes)
                    it += 1
            if eval_this_epoch and epoch_preds:
                from detection_3d_tpu.evaluation.detection_eval import \
                    evaluate_detections
                aug = {"target_Y": cfg.test.eval_aug_thickness_y_tar_anc[0],
                       "anchor_Y": cfg.test.eval_aug_thickness_y_tar_anc[1],
                       "target_Z": cfg.test.eval_aug_thickness_z_tar_anc[0],
                       "anchor_Z": cfg.test.eval_aug_thickness_z_tar_anc[1]}
                res = evaluate_detections(
                    epoch_preds, epoch_gts, cfg.num_classes,
                    cfg.test.iou_threshold, eval_aug_thickness=aug,
                    class_names=cfg.ordered_class_names())
                self.last_train_eval = res
                if self.logger:
                    self.logger.info("eval-in-train epoch %d:\n%s", epoch,
                                     res.summary())
            if (epoch + 1) % ckpt_period == 0:
                self.checkpointer.save(
                    f"model_{epoch:07d}",
                    {"params": state.params, "opt_state": state.opt_state,
                     "step": state.step})
        self.checkpointer.save(
            "model_final", {"params": state.params,
                            "opt_state": state.opt_state,
                            "step": state.step})
        return state

    def _book_step(self, state, total, losses, ok, true_num, dets,
                   step_sids, dt, group, scenes, source, it, epoch,
                   epochs, steps_per_epoch, t_start, eval_this_epoch,
                   epoch_preds, epoch_gts, strikes, culled, culled_names,
                   n_scenes):
        """Per-step host bookkeeping shared by the single / DP / scanned
        paths: eval-in-train accumulation, capacity warnings, meters,
        NaN-strike culling, periodic logging, min-loss checkpoint."""
        cfg = self.cfg
        if dets and eval_this_epoch:
            db, dv, dsc, dl = (np.asarray(x) for x in dets)
            if db.ndim == 2:   # single-device step: one building
                db, dv, dsc, dl = (x[None] for x in (db, dv, dsc, dl))
            for bi in range(min(db.shape[0], len(group))):
                v = dv[bi]
                epoch_preds.append({"boxes": db[bi][v],
                                    "scores": dsc[bi][v],
                                    "labels": dl[bi][v]})
                epoch_gts.append({"boxes": group[bi]["gt_boxes"],
                                  "labels": group[bi]["gt_labels"]})
        cap0 = cfg.caps.scale_caps(cfg.sparse3d.num_scales)[0]
        if int(true_num) > cap0 and self.logger:
            self.logger.warning(
                "iter %d: %d voxels exceed scale-0 capacity %d — "
                "input subsampled (raise caps)", it, int(true_num), cap0)
        self.meters.update(loss=total, time=dt, **losses)
        if not ok:
            if self.logger:
                self.logger.warning("non-finite loss at iter %d; "
                                    "update skipped", it)
            for si in step_sids:
                strikes[si] += 1
                if (strikes[si] >= self.bad_scene_strikes
                        and si not in culled):
                    culled.add(si)
                    name = str(si)
                    if source is None and isinstance(scenes[si], dict):
                        name = str(scenes[si].get("scene_name", si))
                    culled_names.append(name)
                    self._persist_bad_scenes(culled_names)
                    if self.logger:
                        self.logger.warning(
                            "scene %s culled after %d non-finite steps "
                            "(%d/%d scenes culled)", name, strikes[si],
                            len(culled), n_scenes)
        if self.logger and it % 20 == 0:
            eta = (time.time() - t_start) / (it + 1) * \
                (epochs * steps_per_epoch - it - 1)
            self.logger.info(
                "iter %d epoch %d eta %.0fs lr %.5f %s", it, epoch,
                eta, float(self.lr_fn(int(state.step))), self.meters)
        # min-loss checkpoint (trainer_sparse3d.py:145-150): track the
        # minimum every step, serialize at most once per min_save_every
        # iterations (a full msgpack write per step stalls the device
        # loop). Under scanning the saved state is the CHUNK's final
        # state, not the mid-chunk minimum.
        if total < self.min_loss and np.isfinite(total):
            self.min_loss = total
            if it - self._last_min_save >= self.min_save_every:
                self._last_min_save = it
                self.checkpointer.save(
                    "model_min_loss",
                    {"params": state.params,
                     "opt_state": state.opt_state,
                     "step": state.step})
