"""Checkpoint save / discovery / restore.

Parity target: ``nerf_sandbox/source/train/trainer.py:586-696`` (§2 #16):

* step-tagged files ``checkpoints/ckpt_%07d.ckpt`` + a ``ckpt_latest``
  symlink (copy fallback on filesystems without symlinks)
* payload carries step, both model param trees, optimizer state, the full
  config snapshot, and a save timestamp
* discovery: regex max-step over ``ckpt_*`` in the checkpoint dir and the
  experiment root; ``--resume latest|<path>``, ``--auto_resume``,
  ``--resume_no_optim``
* resume fast-forwards the validation schedule and the progress-video block
  cursor (handled by the Trainer from the restored step).

Format: a single ``.npz`` of path-keyed arrays (self-contained; no orbax
directory layout needed for pytrees this small — ~2.4 M params).  RNG needs
no checkpointing: the train step derives its key as ``fold_in(seed, step)``
so restore at step k reproduces the exact stream.
"""

from __future__ import annotations

import io
import json
import re
import shutil
from datetime import datetime
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np

_SEP = "||"


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_like(template, flat: dict, prefix: str):
    """Rebuild a pytree like ``template`` from path-keyed ``flat`` arrays.

    → (tree, missing, used): ``missing`` lists template leaves absent from
    the file (those keep the template's — freshly initialised — value) and
    ``used`` the file keys consumed, so the caller can detect a checkpoint
    saved under a different architecture instead of silently "resuming" a
    partially random model.
    """
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves, missing, used = [], [], set()
    for path, leaf in leaves_with_path:
        key = prefix + _SEP.join(str(p) for p in path)
        arr = flat.get(key)
        if arr is not None and (not hasattr(leaf, "shape")
                                or arr.shape == leaf.shape):
            new_leaves.append(arr.astype(leaf.dtype) if hasattr(leaf, "dtype") else arr)
            used.add(key)
        else:
            # absent OR shape-incompatible (different architecture): keep
            # the template's fresh-init leaf and report it
            new_leaves.append(leaf)
            missing.append(key if arr is None else f"{key} (shape "
                           f"{arr.shape} != {leaf.shape})")
            if arr is not None:
                used.add(key)   # consumed (incompatible) — not "extra" too
    return jax.tree_util.tree_unflatten(treedef, new_leaves), missing, used


def ckpt_path(ckpt_dir: Path, step: int) -> Path:
    return Path(ckpt_dir) / f"ckpt_{step:07d}.ckpt"


def save_checkpoint(ckpt_dir, step: int, state, cfg_dict: dict, *,
                    tag: str | None = None, latest: bool = True,
                    include_optim: bool = True,
                    extra: Optional[dict] = None) -> Path:
    """Serialise TrainState (+config echo) to one .npz file.

    ``extra`` holds auxiliary non-TrainState arrays that must survive resume
    exactly — today the occupancy grid (the EMA over past updates is NOT a
    pure function of the current params, so rebuilding it on resume only
    approximates the uninterrupted run; checkpointing it makes resume
    bit-exact). Reference resume contract: trainer.py:670-696.
    """
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = (ckpt_dir / f"{tag}.ckpt") if tag else ckpt_path(ckpt_dir, step)

    payload = {}
    for name, val in _flatten(state.params_c).items():
        payload["params_c" + _SEP + name] = val
    for name, val in _flatten(state.params_f).items():
        payload["params_f" + _SEP + name] = val
    if include_optim:
        for name, val in _flatten(state.opt_state).items():
            payload["opt" + _SEP + name] = val
    for name, val in (extra or {}).items():
        payload["extra" + _SEP + name] = np.asarray(val)
    meta = {"step": int(step),
            "saved_at": datetime.now().isoformat(timespec="seconds"),
            "cfg": cfg_dict}
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta, default=str).encode(), dtype=np.uint8)

    buf = io.BytesIO()
    np.savez(buf, **payload)
    path.write_bytes(buf.getvalue())
    print(f"[CKPT] saved -> {path}")

    if latest:
        latest_path = ckpt_dir / "ckpt_latest.ckpt"
        try:
            if latest_path.exists() or latest_path.is_symlink():
                latest_path.unlink()
            latest_path.symlink_to(path.name)
        except OSError:
            shutil.copyfile(path, latest_path)
    return path


# ---------------------------------------------------------------------------
# Orbax backend — async, sharding-aware saves for multi-host scale.  Same
# payload semantics (state + config echo); retention handled by the manager.
# ---------------------------------------------------------------------------

class OrbaxCheckpointer:
    """Thin wrapper over orbax.checkpoint.CheckpointManager.

    Use for large / multi-host runs: saves are asynchronous (training
    continues while the write completes) and arrays restore directly onto
    their mesh shardings.  The npz backend remains the default for its
    single-file portability and the reference's ``ckpt_latest`` semantics.
    """

    def __init__(self, ckpt_dir, max_to_keep: int | None = None):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        # item_handlers registers the Standard handler up front so
        # item_metadata() works on a FRESH manager (resume in a new
        # process) — without it orbax returns None until the first
        # save/restore-with-args
        self.mgr = ocp.CheckpointManager(
            Path(ckpt_dir).resolve(),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
            item_handlers=ocp.StandardCheckpointHandler())

    def save(self, step: int, state, cfg_dict: dict,
             extra: Optional[dict] = None) -> None:
        payload = {"state": {"step": state.step, "params_c": state.params_c,
                             "params_f": state.params_f,
                             "opt_state": state.opt_state}}
        if extra:
            payload["extra"] = dict(extra)
        self.mgr.save(int(step), args=self._ocp.args.StandardSave(payload))
        meta = Path(self.mgr.directory) / f"cfg_{int(step)}.json"
        meta.write_text(json.dumps({"cfg": cfg_dict, "step": int(step),
                                    "saved_at": datetime.now().isoformat(
                                        timespec="seconds")}, default=str))
        print(f"[CKPT] (orbax) saved step {step} -> {self.mgr.directory}")

    def latest_step(self):
        return self.mgr.latest_step()

    def restore(self, step: int, state, *, load_optim: bool = True,
                extra_template: Optional[dict] = None):
        """→ (state, step, extras) — ``extras`` is {} unless the checkpoint
        carries auxiliary arrays (e.g. the occupancy grid).

        The saved tree's shape is read from orbax METADATA (not try/except
        structure probing, which would silently discard a checkpointed
        grid on any transient first-attempt failure): both subset
        directions are legal — a pre-grid checkpoint restores into an
        occupancy run (extras={}), and a checkpoint WITH extras restores
        into a run that expects none (the extras template is rebuilt from
        the checkpoint's own array metadata). The template keeps optax's
        NamedTuple node types intact."""
        template = {"state": {"step": state.step, "params_c": state.params_c,
                              "params_f": state.params_f,
                              "opt_state": state.opt_state}}
        meta_extra = None
        try:
            meta = self.mgr.item_metadata(int(step))
            if "extra" in set(meta.keys()):
                meta_extra = meta["extra"]
        except Exception:
            # metadata unavailable (older orbax): assume the checkpoint
            # matches this run's configuration
            if extra_template:
                meta_extra = dict(extra_template)
        if meta_extra is not None:
            # the checkpoint carries extras: restore them whether or not
            # this run asked (shapes from the checkpoint's own metadata
            # when the run has no template of its own)
            template["extra"] = (dict(extra_template) if extra_template else
                                 jax.tree_util.tree_map(
                                     lambda am: np.zeros(am.shape, am.dtype),
                                     dict(meta_extra)))
        full = self.mgr.restore(
            int(step), args=self._ocp.args.StandardRestore(template))
        out = full["state"]
        extras = full.get("extra") or {}
        # restore to host numpy so downstream jit/mesh placement is free
        # (orbax pins restored arrays to single-device shardings otherwise)
        out = jax.tree_util.tree_map(np.asarray, out)
        extras = jax.tree_util.tree_map(np.asarray, extras)
        import jax.numpy as jnp
        return state._replace(
            step=jnp.int32(out["step"]), params_c=out["params_c"],
            params_f=out["params_f"],
            opt_state=out["opt_state"] if load_optim else state.opt_state), \
            int(out["step"]), extras

    def close(self):
        self.mgr.wait_until_finished()
        self.mgr.close()


def load_extras(path) -> dict:
    """Auxiliary arrays saved alongside the state (``extra`` of
    :func:`save_checkpoint`) → {name: np.ndarray}; {} for old checkpoints."""
    prefix = "extra" + _SEP
    with np.load(Path(path), allow_pickle=False) as zf:
        return {k[len(prefix):]: zf[k] for k in zf.files
                if k.startswith(prefix)}


_STEP_RE = re.compile(r"(?:ckpt|step)[_-]?(\d+)", re.IGNORECASE)


def step_of_path(p) -> int:
    """Step number encoded in a checkpoint filename, or -1."""
    m = _STEP_RE.search(Path(p).name)
    return int(m.group(1)) if m else -1


def peek_checkpoint_meta(out_dir) -> Optional[tuple]:
    """Latest checkpoint's ``(step, saved-cfg dict)`` for a run dir, WITHOUT
    constructing a Trainer or loading model arrays.

    Looks at both backends: npz checkpoints (two-dir discovery, tagged
    signal saves included — reads just the ``__meta__`` member of the zip)
    and the orbax ``cfg_<step>.json`` config echoes; returns whichever is
    newer, or None when the run has no checkpoint at all. Lets eval-time
    tooling (scripts/eval_nerf.py) restore the run's trained configuration
    instead of requiring every architecture flag to be re-passed.
    """
    out_dir = Path(out_dir)
    best = None  # (step, cfg_dict)

    npz = find_latest_checkpoint(out_dir / "checkpoints", out_dir)
    if npz is not None:
        try:
            with np.load(npz, allow_pickle=False) as z:
                meta = json.loads(bytes(z["__meta__"]).decode())
            best = (int(meta.get("step", step_of_path(npz))),
                    dict(meta.get("cfg", {})))
        except Exception as e:
            print(f"[CKPT] could not read meta from {npz}: {e}")

    metas = sorted((out_dir / "checkpoints").glob("cfg_*.json"),
                   key=lambda p: int(p.stem.split("_")[-1]))
    if metas:
        try:
            meta = json.loads(metas[-1].read_text())
            step = int(meta.get("step", -1))
            if best is None or step > best[0]:
                best = (step, dict(meta.get("cfg", {})))
        except Exception as e:
            print(f"[CKPT] could not read {metas[-1]}: {e}")
    return best


def find_latest_checkpoint(ckpt_dir, out_dir=None) -> Optional[Path]:
    candidates = []
    for d in filter(None, [ckpt_dir, out_dir]):
        d = Path(d)
        if d.is_dir():
            # include tagged saves (pause_step_N / interrupt_step_N) so
            # --auto_resume picks up signal checkpoints too
            candidates += [p for p in d.glob("*.ckpt")
                           if not p.is_symlink() and _STEP_RE.search(p.name)]
    if not candidates:
        return None
    candidates.sort(key=lambda p: (step_of_path(p), p.stat().st_mtime))
    return candidates[-1]


def load_checkpoint(path, state, *, load_optim: bool = True,
                    allow_partial: bool = False) -> Tuple[Any, int, dict]:
    """Restore into the template ``state`` → (new_state, step, cfg_dict).

    A key-set mismatch between the file and the template (checkpoint saved
    under a different --encoder / --sampling / architecture) raises unless
    ``allow_partial`` (--allow_partial_restore), in which case missing
    leaves keep their fresh-init values with a loud warning.
    """
    path = Path(path)
    print(f"[CKPT] loading <- {path}")
    with np.load(path, allow_pickle=False) as zf:
        flat = {k: zf[k] for k in zf.files}
    meta = json.loads(bytes(flat.pop("__meta__")).decode())
    step = int(meta.get("step", 0))

    params_c, miss_c, used_c = _unflatten_like(state.params_c, flat, "params_c" + _SEP)
    params_f, miss_f, used_f = _unflatten_like(state.params_f, flat, "params_f" + _SEP)
    missing = miss_c + miss_f
    used = used_c | used_f
    extra = [k for k in flat
             if k.startswith(("params_c" + _SEP, "params_f" + _SEP))
             and k not in used]
    if missing or extra:
        msg = (f"checkpoint/model key mismatch: {len(missing)} template "
               f"param(s) missing from the file, {len(extra)} file param(s) "
               f"unused (e.g. missing={missing[:3]} extra={extra[:3]}). "
               "The checkpoint was likely saved under a different --encoder/"
               "--sampling/architecture config.")
        if not allow_partial:
            raise ValueError(
                msg + " Pass --allow_partial_restore to load anyway "
                "(missing params stay freshly initialised).")
        print(f"[CKPT] WARNING: partial restore — {msg}")

    opt_state = state.opt_state
    if load_optim and any(k.startswith("opt" + _SEP) for k in flat):
        opt_state, miss_o, _ = _unflatten_like(state.opt_state, flat, "opt" + _SEP)
        if miss_o:
            # Same gate as params: a shape change (e.g. toggling --lr_grid
            # wraps leaves in MultiTransformState paths) silently resets
            # Adam moments otherwise — a loss spike with no error.
            omsg = (f"checkpoint/optimizer key mismatch: {len(miss_o)} "
                    f"template optimizer leaves missing from the file "
                    f"(e.g. {miss_o[:3]}). The checkpoint was likely saved "
                    "under a different optimizer config (--lr_grid?).")
            if not allow_partial:
                raise ValueError(
                    omsg + " Pass --allow_partial_restore to load anyway "
                    "(missing moments stay freshly initialised), or "
                    "--resume_no_optim to discard optimizer state.")
            print(f"[CKPT] WARNING: partial restore — {omsg}")

    import jax.numpy as jnp
    new_state = state._replace(step=jnp.int32(step), params_c=params_c,
                               params_f=params_f, opt_state=opt_state)
    return new_state, step, meta.get("cfg", {})
