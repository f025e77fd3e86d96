"""Orbax checkpoint/resume (SURVEY.md §5.3/§5.4: crash-only design).

The trainer is deterministic given (config, epoch): negative-sampling keys
are derived by ``fold_in(base_key, epoch)``, so restoring {params, opt_state,
epoch} reproduces the uninterrupted trajectory exactly (kill-and-resume test
in tests/test_checkpoint.py).  Sharded arrays save/restore per-host via
Orbax; restoring onto a different mesh works through Orbax resharding.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def _manager(directory: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


class Checkpointer:
    """Thin step-scoped wrapper; ``enabled=False`` makes every call a no-op.

    Preemption awareness (the single-host analog of Orbax emergency
    checkpointing): ``install_preemption_handler()`` latches SIGTERM — the
    signal cloud schedulers send before reclaiming a VM — into
    ``self.preempted``; the training loops force-save the live state and exit
    cleanly at the next epoch boundary, so a relaunch loses at most one epoch
    instead of everything since the last periodic checkpoint."""

    def __init__(self, directory: str | None, every: int = 0):
        self.enabled = bool(directory) and every > 0
        self.every = every
        self._dir = os.path.abspath(directory) if directory else None
        self._mgr = _manager(directory) if self.enabled else None
        self.preempted = False
        self._prev_handler = None

    def install_preemption_handler(self):
        if not self.enabled:
            return
        import signal

        def _latch(signum, frame):
            self.preempted = True

        try:
            self._prev_handler = signal.signal(signal.SIGTERM, _latch)
        except ValueError:
            pass  # non-main thread: periodic checkpoints still protect the run

    def restore_handler(self):
        if self._prev_handler is not None:
            import signal

            try:
                signal.signal(signal.SIGTERM, self._prev_handler)
            except ValueError:
                pass
            self._prev_handler = None

    def maybe_save(self, epoch: int, state: dict, force: bool = False):
        if not self.enabled:
            return
        if force or (epoch > 0 and epoch % self.every == 0):
            if self._mgr.latest_step() == epoch:
                return  # already saved (e.g. forced final save after an in-loop save)
            import orbax.checkpoint as ocp

            self._mgr.save(epoch, args=ocp.args.StandardSave(state))

    def latest_step(self) -> int | None:
        """Step of the newest checkpoint on disk, or None (also None when
        disabled).  Lets eval-only callers (train/driver.evaluate) verify a
        checkpoint exists BEFORE building the trainer state."""
        if not self.enabled:
            return None
        return self._mgr.latest_step()

    def latest_has_key(self, key: str) -> bool | None:
        """Whether the newest checkpoint's top-level tree contains ``key``
        (from Orbax metadata, no array reads); None if no checkpoint or the
        metadata is unreadable.  Lets callers distinguish a genuinely
        missing key (legacy on-disk format) from other restore failures."""
        if not self.enabled:
            return None
        step = self._mgr.latest_step()
        if step is None:
            return None
        try:
            md = self._mgr.item_metadata(step)
        except Exception:
            md = None
        if md is None:
            # On orbax 0.11 a manager serves item_metadata from an
            # in-memory cache populated by its own save OR by a (possibly
            # failed) restore attempt; a fresh manager probed BEFORE any
            # restore — train/driver.evaluate's checkpoint-format probe —
            # gets None, and the round-4b `key in md` then raised a
            # TypeError that the blanket except silently turned into
            # "can't tell" (the ADVICE r4 item 3 failure mode, caught in
            # round 5 when the swallow was made loud).  Read the item's
            # on-disk metadata directly instead — correct regardless of
            # cache state or which process wrote the checkpoint.
            import orbax.checkpoint as ocp

            try:
                step_md = ocp.StandardCheckpointer().metadata(
                    os.path.join(self._dir, str(step), "default"))
                md = step_md.item_metadata
            except Exception:
                return None  # genuinely unreadable: caller re-raises its own error
        # Explicit keys() membership, normalized across Orbax containers
        # (TreeMetadata wrappers carry the dict under .tree).  Unrecognized
        # containers raise loudly instead of disabling the detection.
        if not hasattr(md, "keys") and hasattr(md, "tree"):
            md = md.tree
        if not hasattr(md, "keys"):
            raise TypeError(
                f"unrecognized Orbax item_metadata container {type(md)!r} — "
                f"cannot verify the checkpoint's top-level keys; the "
                f"legacy-checkpoint diagnostics in fit/fit_distributed "
                f"depend on this (update latest_has_key for this Orbax "
                f"version)")
        return key in md.keys()

    def restore_latest(self, abstract_state: dict) -> tuple[int, Any] | None:
        """Returns (epoch, state) of the newest checkpoint, or None."""
        if not self.enabled:
            return None
        step = self._mgr.latest_step()
        if step is None:
            return None
        import orbax.checkpoint as ocp

        state = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))
        return step, state

    def close(self):
        """Flush pending async saves; idempotent.  MUST run before process
        exit or an in-flight (e.g. emergency) save is silently lost."""
        if self._mgr is not None:
            self._mgr.wait_until_finished()
            self._mgr.close()
            self._mgr = None
            self.enabled = False


def abstract_like(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else x, tree
    )
