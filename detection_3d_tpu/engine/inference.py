"""Inference engine: jitted per-building forward + evaluation.

Parity with the reference inference loop
(/root/reference/maskrcnn_benchmark/engine/inference_3d.py:16-144):
eval-mode forward per building, collect detections on host, run the
VOC-style evaluator, report total/per-building time. The whole pipeline
(voxelize -> backbone -> heads -> NMS) is ONE jitted function — the
reference's 4.75 s/building includes three host<->device round-trips that
this design eliminates.
"""

from __future__ import annotations

import time
from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from detection_3d_tpu.config.defaults import Config
from detection_3d_tpu.engine.trainer import pad_scene
from detection_3d_tpu.evaluation.detection_eval import evaluate_detections
from detection_3d_tpu.models.detector import SparseRCNN, voxelize_points
from detection_3d_tpu.models.structures import Boxes3D


def make_predict_fn(cfg: Config, model: Optional[SparseRCNN] = None,
                    packed=False):
    """Jitted per-building predict.

    Returns ``(packed_out, true_num)``: ``packed_out`` is (K, 10) f32
    ``[boxes7 | score | label | valid]`` — one fused output buffer so
    the serving fetch is 2 D2H round trips, not 5.

    ``packed`` selects the input form:
      False    — raw f32 batch dict (pad_scene);
      True     — quantized point dict (data/packing.pack_scene): 4x less
                 host->device transfer, voxelized on device;
      "table"  — host-prepared voxel table (data/packing.pack_table):
                 the sort/dedup input layer runs in the (pipelined) host
                 loader, zero device time on the voxelize stage;
      "pyramid"— host-prepared table + FULL pyramid metadata
                 (data/pyramid_packing.pack_pyramid): every per-scale
                 table, conv/deconv/submanifold/BEV rulebook and
                 windowed relayout is built in the loader (the
                 reference's host-side SCN Metadata role) — the device
                 runs only dense math.
    """
    if packed not in (False, True, "table", "pyramid"):
        raise ValueError(
            f"packed={packed!r}: expected False, True, 'table' or "
            "'pyramid'")
    model = model or SparseRCNN(cfg)

    @jax.jit
    def predict(params, batch):
        return _predict_one(cfg, model, packed, params, batch)

    return predict


def _predict_one(cfg, model, packed, params, batch):
    pyramid = None
    if packed == "pyramid":
        from detection_3d_tpu.data.pyramid_packing import unpack_pyramid
        table, pyramid = unpack_pyramid(cfg, batch)
    elif packed == "table":
        from detection_3d_tpu.data.packing import unpack_table
        table = unpack_table(cfg, batch)
    else:
        if packed:
            from detection_3d_tpu.data.packing import unpack_batch
            batch = unpack_batch(cfg, batch)
        table = voxelize_points(cfg, batch["points"], batch["feats"],
                                batch["points_valid"])
    det = model.apply(params, table, is_train=False, pyramid=pyramid)
    # fuse the outputs into ONE (K, 10) array [boxes7|score|label|valid]
    # plus the true_num scalar: on the tunneled TPU backend every output
    # buffer is a separate D2H round trip, and the fetch rides the
    # serving pipeline's critical path (2 RPCs/building instead of 5)
    packed_out = jnp.concatenate(
        [det.boxes,
         det.fields["scores"][:, None],
         det.fields["labels"].astype(jnp.float32)[:, None],
         det.valid.astype(jnp.float32)[:, None]], axis=-1)
    return packed_out, table.true_num


def make_batch_predict_fn(cfg: Config, model: Optional[SparseRCNN] = None,
                          packed="table"):
    """Jitted MULTI-building predict: vmap of the per-building forward.

    The reference serves strictly one building per GPU step
    (launch scripts pin bs=1: /root/reference/sw_4c_fpn432_bs1_lr2.sh);
    on TPU the padded static-capacity tables stack to a leading batch
    axis, so throughput serving is one ``jax.vmap`` away — the MXU sees
    B-times-larger GEMMs at identical per-building rulebook work.
    Feed with stacked packed dicts (``np.stack`` per key over
    ``pack_table``/``pack_pyramid`` outputs); every output gains a
    leading batch axis.
    """
    if packed not in (True, "table", "pyramid"):
        raise ValueError(
            f"packed={packed!r}: expected True, 'table' or 'pyramid'")
    model = model or SparseRCNN(cfg)

    @jax.jit
    def predict(params, stacked):
        return jax.vmap(
            lambda b: _predict_one(cfg, model, packed, params, b)
        )(stacked)

    return predict


def run_inference(cfg: Config, params, scenes: Iterable[Dict],
                  logger=None, evaluate: bool = True,
                  pipelined: bool = False, pack_workers: int = 2,
                  pack_mode: str = "pyramid", predict_fn=None,
                  timings: Optional[Dict[str, float]] = None,
                  batch_size: int = 1):
    """Returns (predictions, eval_result_or_None, seconds_per_building).

    With ``pipelined=True`` the serving fast path runs: building N+1's
    host pack AND its host->device transfer proceed on a worker thread
    pool while the device executes building N (the workers call
    jax.device_put, so H2D rides the pipeline too), and the output
    fetch of building N overlaps the device execution of building N+1
    (double buffering: dispatch i, then drain i-1). This mirrors how
    the reference hides its DataLoader workers' IO — but also hides
    transfer and fetch, which the reference pays synchronously.
    ``pack_mode`` picks the host/device work split:
      "pyramid" — the full SCN-Metadata-equivalent build (every
          per-scale table + rulebook, C++ packer) rides the loader; the
          device runs only dense math. Lowest device time; needs
          host_pack_s / pack_workers < device_s to stay hidden (~0.9 s
          of host work per full-scale building).
      "table" — only quantize/sort/dedup (the input layer) packs on the
          host (~6x cheaper); per-scale metadata builds in-graph. Best
          end-to-end on host-core-starved machines where the pyramid
          pack cannot be hidden.

    ``timings`` (pipelined only): pass a dict to receive the summed
    per-phase wall-clock attribution across the stream (seconds):
    wait_pack (pack+H2D not hidden by the pipeline), dispatch (jitted
    call issue), drain_fetch (device completion + D2H of detections).

    ``batch_size`` > 1 (pipelined only) serves buildings in vmapped
    batches (make_batch_predict_fn): workers pack+stack ``batch_size``
    buildings per unit, the device runs one batched forward per unit.
    Throughput mode — per-unit latency grows, buildings/s grows.
    """
    if pack_mode not in ("pyramid", "table"):
        raise ValueError(
            f"pack_mode={pack_mode!r}: expected 'pyramid' or 'table'")
    scenes = list(scenes)
    preds = []
    gts = []
    total_t = 0.0
    cap0 = cfg.caps.scale_caps(cfg.sparse3d.num_scales)[0]

    def record_pred(i, out):
        packed_out, true_num = out
        if int(true_num) > cap0 and logger:
            logger.warning(
                "scene %d: %d voxels exceed the scale-0 capacity %d — "
                "input subsampled (raise caps.voxel_caps / max_points)",
                i, int(true_num), cap0)
        a = np.asarray(packed_out)
        v = a[:, 9] > 0.5
        preds.append({"boxes": a[v, :7],
                      "scores": a[v, 7],
                      "labels": a[v, 8].astype(np.int32)})
        gts.append({"boxes": scenes[i]["gt_boxes"],
                    "labels": scenes[i]["gt_labels"]})

    if pipelined:
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        if pack_mode == "pyramid":
            from detection_3d_tpu.data.native_packer import (
                pack_pyramid_native as pack_fn,
            )
        else:
            from detection_3d_tpu.data.native_packer import (
                pack_table_native as pack_fn,
            )

        B = max(1, batch_size)
        units = [list(range(i, min(i + B, len(scenes))))
                 for i in range(0, len(scenes), B)]
        if predict_fn is not None:
            predict = predict_fn
        elif B > 1:
            predict = make_batch_predict_fn(cfg, packed=pack_mode)
        else:
            predict = make_predict_fn(cfg, packed=pack_mode)
        pool = ThreadPoolExecutor(max_workers=max(1, pack_workers))

        def pack_and_put(unit):
            # pack on the worker AND push to the device from the worker:
            # H2D transfer overlaps the device's previous building
            if B == 1:
                return jax.device_put(pack_fn(cfg, scenes[unit[0]]))
            packs = [pack_fn(cfg, scenes[j]) for j in unit]
            if len(packs) < B:  # pad the tail to the compiled batch
                packs += [packs[-1]] * (B - len(packs))
            return jax.device_put(
                {k: np.stack([p[k] for p in packs]) for k in packs[0]})

        def record_unit(unit, out):
            if B == 1:
                record_pred(unit[0], out)
            else:
                arrs = [np.asarray(a) for a in out]
                for bi, si in enumerate(unit):
                    record_pred(si, tuple(a[bi] for a in arrs))

        tm = {"wait_pack": 0.0, "dispatch": 0.0, "drain_fetch": 0.0}
        q = deque()
        for j in range(min(pack_workers, len(units))):
            q.append(pool.submit(pack_and_put, units[j]))
        pending = None  # (unit, out) dispatched but not yet fetched
        n_timed = 0
        for i in range(len(units)):
            nxt = i + pack_workers
            if nxt < len(units):
                q.append(pool.submit(pack_and_put, units[nxt]))
            t0 = time.time()
            batch = q.popleft().result()
            t1 = time.time()
            out = predict(params, batch)
            t2 = time.time()
            # double buffer: fetch unit i-1 while the device (and the
            # async dispatch queue) works on unit i
            if pending is not None:
                record_unit(pending[0], pending[1])
            pending = (units[i], out)
            t3 = time.time()
            tm["wait_pack"] += t1 - t0
            tm["dispatch"] += t2 - t1
            tm["drain_fetch"] += t3 - t2
            if i > 0:
                total_t += t3 - t0
                n_timed += len(units[i])
        if pending is not None:
            t0 = time.time()
            record_unit(pending[0], pending[1])
            tm["drain_fetch"] += time.time() - t0
            if len(units) > 1:
                total_t += time.time() - t0
        pool.shutdown(wait=False)
        if timings is not None:
            timings.update(tm)
        sec_per_building = total_t / max(n_timed, 1)
    else:
        predict = predict_fn or make_predict_fn(cfg)
        for i, scene in enumerate(scenes):
            batch = {k: jnp.asarray(v)
                     for k, v in pad_scene(cfg, scene).items()}
            t0 = time.time()
            out = predict(params, batch)
            jax.block_until_ready(out[0])
            dt = time.time() - t0
            if i > 0:  # skip compile iteration in timing
                total_t += dt
            record_pred(i, out)
        sec_per_building = total_t / max(len(scenes) - 1, 1)

    result = None
    if evaluate:
        aug = {"target_Y": cfg.test.eval_aug_thickness_y_tar_anc[0],
               "anchor_Y": cfg.test.eval_aug_thickness_y_tar_anc[1],
               "target_Z": cfg.test.eval_aug_thickness_z_tar_anc[0],
               "anchor_Z": cfg.test.eval_aug_thickness_z_tar_anc[1]}
        result = evaluate_detections(
            preds, gts, cfg.num_classes, cfg.test.iou_threshold,
            eval_aug_thickness=aug, class_names=cfg.ordered_class_names())
        if logger:
            logger.info("\n%s", result.summary())
            logger.info("sec/building: %.3f", sec_per_building)
    return preds, result, sec_per_building
