"""Checkpoint/resume — a capability the reference lacks entirely.

The reference only pickles the whole torch module on a new best metric
(``/root/reference/main.py:373-375``); there is no optimizer state, no RNG, no
importance-sampler state, and no loading code anywhere. Here the complete
TrainState (params, AdamW moments, Lt ring buffer, RNG key, step counter) is
checkpointed with Orbax and restored bit-exactly (test: test_checkpoint.py).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from gdmcf_tpu.train.state import TrainState


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, state: TrainState, step: Optional[int] = None,
             extra: Optional[dict] = None, block: bool = True) -> None:
        """``extra``: small JSON-serializable training metadata (best metric /
        best epoch) persisted in a sidecar so resume does not reset model
        selection (a fresh best_metric=-100 would let the first post-resume
        eval rotate out the genuinely-best checkpoint).

        ``block=False`` returns once the device arrays are snapshotted and
        lets Orbax write to disk in the background (training continues
        through the IO; a subsequent save or :meth:`wait` synchronizes).
        Orbax writes atomically (tmp dir + rename), so a crash mid-write
        never leaves a half checkpoint visible to restore. The ``extra``
        sidecar is only written AFTER its checkpoint commits (deferred to
        the next save/:meth:`wait` when non-blocking): meta must never point
        at a best checkpoint that did not land — resume would then chase a
        phantom best_metric and could early-stop on stale state. The
        opposite staleness (checkpoint landed, meta one best behind) is
        harmless: resume just re-saves on the next best."""
        step = int(state.step) if step is None else int(step)
        # commit any previous async save AND flush its deferred sidecar
        # before starting a new one — unconditionally: overwriting
        # _pending_extra below on a block=True save would otherwise DROP
        # the previous async save's sidecar (best_metric resets to -100 on
        # resume, the exact failure this machinery exists to prevent)
        self.wait()
        self.manager.save(step, args=ocp.args.StandardSave(state))
        self._pending_extra = extra
        if block:
            self.wait()

    def wait(self) -> None:
        """Block until any in-flight background save has committed, then
        write its deferred ``extra`` sidecar."""
        self.manager.wait_until_finished()
        extra = getattr(self, "_pending_extra", None)
        if extra is not None:
            import json
            self._pending_extra = None
            with open(os.path.join(self.directory, "train_meta.json"), "w") as fh:
                json.dump(extra, fh)

    def load_extra(self) -> Optional[dict]:
        """Read back the sidecar written by ``save(extra=...)`` (None if absent)."""
        import json
        path = os.path.join(self.directory, "train_meta.json")
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(template))
        return TrainState(*restored)

    def close(self):
        self.wait()  # a deferred sidecar must not die with the manager
        self.manager.close()
