"""Checkpointing (reference layer L7, SURVEY.md §5.4).

The reference torch.saves state_dict bundles — including the discriminator
alongside the VAE (v1:1188-1191) — and parses the resume epoch out of the
checkpoint FILENAME (v1:1179-1191, 1352-1363). Here checkpoints are Orbax
trees under explicit `step_N` directories; `parse_epoch_from_filename` is
kept as a parity helper so reference-style `...epoch_N.pt` paths still
resume correctly through the CLI.

Beyond-reference fidelity: full-state serialization helpers capture the
COMPLETE training state — params, optimizer moments (Adam mu/nu), and the
step counter that positions the LR schedule — so a process restart resumes
bit-exactly (tested in tests/test_checkpoints.py). The reference restarts
optimizers from scratch on resume; we don't.

Crash safety: a save never destroys the previous checkpoint of the same step
until the new one is fully committed. Orbax itself commits atomically
(tmp-dir + rename); overwriting an existing step renames the old directory
aside first and removes it only after the new save lands.
"""
from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional

import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"^step_(\d+)$")


def parse_epoch_from_filename(path: str) -> Optional[int]:
    """`.../conditional_diffusion_epoch_450.pt` -> 450 (v1:1352-1363)."""
    m = re.search(r"epoch_(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else None


def state_to_tree(train_state) -> dict:
    """Serialize a flax TrainState to a pure-array pytree: params + optimizer
    state (Adam moments, schedule position) + step counter (+ the EMA
    weight tree for EMATrainState, so EMA sampling resumes exactly)."""
    tree = {
        "params": train_state.params,
        "opt_state": train_state.opt_state,
        "step": train_state.step,
    }
    ema = getattr(train_state, "ema_params", None)
    if ema is not None:
        tree["ema_params"] = ema
    return tree


def tree_into_state(train_state, tree: dict):
    """Rebuild a TrainState from a `state_to_tree` pytree (exact resume)."""
    state = train_state.replace(
        params=tree["params"], opt_state=tree["opt_state"], step=tree["step"]
    )
    if "ema_params" in tree:
        state = state.replace(ema_params=tree["ema_params"])
    return state


def vae_gan_state_to_tree(state) -> dict:
    """Full VAE-GAN bundle: generator + discriminator TrainStates + EMA
    centers (reference saves VAE + D state dicts, v1:1188-1191; optimizer
    state is our fidelity improvement)."""
    return {
        "gen": state_to_tree(state.gen),
        "disc": state_to_tree(state.disc),
        "centers": state.centers,
    }


def tree_into_vae_gan_state(state, tree: dict):
    return state.replace(
        gen=tree_into_state(state.gen, tree["gen"]),
        disc=tree_into_state(state.disc, tree["disc"]),
        centers=tree["centers"],
    )


class CheckpointManager:
    """Atomic step-directory checkpoints: save(step, pytree) / restore().

    Layout: `<directory>/step_<N>/` each an Orbax StandardCheckpointer
    checkpoint. Old steps beyond `max_to_keep` are pruned (the newest are
    kept; pruning never removes the step just written).
    """

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        self._ckptr = ocp.StandardCheckpointer()
        # Recover from a save that crashed mid-sequence. A `.old` with no
        # step dir means the crash hit between the two renames — the backup
        # is the only surviving copy, so restore it. Any other `.new`/`.old`
        # is redundant staging and is swept.
        for name in sorted(os.listdir(self.directory)):
            path = os.path.join(self.directory, name)
            if name.endswith(".old"):
                step_dir = path[:-4]
                if not os.path.exists(step_dir):
                    os.rename(path, step_dir)
                else:
                    shutil.rmtree(path)
        for name in sorted(os.listdir(self.directory)):
            if name.endswith(".new"):
                shutil.rmtree(os.path.join(self.directory, name))

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step}")

    def all_steps(self) -> list[int]:
        steps = []
        for name in os.listdir(self.directory):
            m = _STEP_RE.match(name)
            if m and not os.path.exists(
                os.path.join(self.directory, name, "_incomplete")
            ):
                steps.append(int(m.group(1)))
        return sorted(steps)

    def save(self, step: int, tree: Any) -> None:
        target = self._step_dir(step)
        staging = target + ".new"
        backup = target + ".old"
        for stale in (staging, backup):
            if os.path.exists(stale):
                shutil.rmtree(stale)
        # Fetch the whole tree to HOST in one bulk device_get before handing
        # it to Orbax — the mirror of restore()'s bulk-upload fix below:
        # passing device arrays lets Orbax pull each leaf in small async
        # chunks (~8.5 MB/s measured on the tunneled runtime — a ~100 s save
        # for the 864 MB VAE-GAN state, 25% of the round-5 flagship VAE
        # stage) vs ~80 MB/s for one bulk transfer.
        import jax

        tree = jax.device_get(tree)
        # Orbax commits `staging` atomically (tmp write + rename).
        self._ckptr.save(staging, tree)
        self._ckptr.wait_until_finished()
        if os.path.exists(target):
            os.rename(target, backup)
        os.rename(staging, target)
        if os.path.exists(backup):
            shutil.rmtree(backup)
        self._prune(keep_step=step)

    def _prune(self, keep_step: int) -> None:
        steps = self.all_steps()
        excess = len(steps) - self.max_to_keep
        for s in steps:
            if excess <= 0:
                break
            if s == keep_step:
                continue
            shutil.rmtree(self._step_dir(s))
            excess -= 1

    def restore_host(self, step: Optional[int] = None, like: Any = None) -> Any:
        """Restore to HOST numpy only — no device upload. For
        sampling-only consumers (serving, eval tools) that upload a small
        subtree themselves: the disk read is local and fast, while every
        device_put byte crosses the tunnel (~1-20 MB/s); a full 864 MB
        VAE-GAN state upload costs minutes when only the ~280 MB generator
        params (or less) are needed."""
        import jax
        import numpy as np

        step = self.latest_step() if step is None else step
        if step is None or not os.path.exists(self._step_dir(step)):
            raise FileNotFoundError(
                f"no checkpoint for step {step} in {self.directory}"
            )
        if like is None:
            return self._ckptr.restore(self._step_dir(step))
        like_np = jax.tree.map(
            lambda a: np.empty(a.shape, a.dtype) if hasattr(a, "shape") else a,
            like,
        )
        return self._ckptr.restore(self._step_dir(step), like_np)

    def restore(self, step: Optional[int] = None, like: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None or not os.path.exists(self._step_dir(step)):
            raise FileNotFoundError(
                f"no checkpoint for step {step} in {self.directory}"
            )
        if like is not None:
            # Restore to HOST numpy, then upload the whole tree in one bulk
            # device_put. Passing device arrays as `like` makes Orbax write
            # each leaf to the device in small async chunks — measured
            # ~1.3 MB/s effective on the tunneled runtime (655 s for an
            # 864 MB VAE-GAN state) vs ~80 MB/s for bulk transfers.
            import jax
            import numpy as np

            like_np = jax.tree.map(
                lambda a: np.empty(a.shape, a.dtype)
                if hasattr(a, "shape") else a,
                like,
            )
            restored = self._ckptr.restore(self._step_dir(step), like_np)
            # Re-apply each `like` leaf's sharding (mesh runs hand in sharded
            # arrays); one bulk host->device transfer per leaf either way.
            restored = jax.tree.map(
                lambda r, l: jax.device_put(r, l.sharding)
                if hasattr(l, "sharding") else jax.device_put(r),
                restored, like,
            )
            jax.block_until_ready(restored)
            return restored
        return self._ckptr.restore(self._step_dir(step))

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def exists(self) -> bool:
        return self.latest_step() is not None
