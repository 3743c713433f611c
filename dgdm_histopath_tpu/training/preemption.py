"""Cooperative preemption handling for TPU training jobs.

Cloud TPU VMs (and most batch schedulers) deliver SIGTERM a short grace
window before the host is reclaimed. The reference has no preemption story:
an interrupted Lightning fit loses everything since the last epoch-end
checkpoint (reference cli/train.py:304-330 registers no signal handling,
and its ``trainer.py`` manual checkpoints only fire on val epochs). Here a
signal only flips a flag — no work happens in the handler — and
``DGDMTrainer.fit`` observes the flag at the next step boundary, writes an
emergency checkpoint tagged with the exact (epoch, step-in-epoch) position,
and returns cleanly.

Resume is bit-identical, not approximate: per-step rngs are derived by
folding ``state.step`` (trainer ``_get_step_fn``), the optimizer state and
rng live inside the checkpointed ``TrainState``, and the fit loop can skip
the first ``step_in_epoch`` batches of a deterministic loader — so the
resumed run replays the remaining steps exactly (tested in
``tests/test_training.py``).
"""

from __future__ import annotations

import signal
import threading
from typing import Iterable, Optional, Tuple

from ..utils.logging import get_logger

logger = get_logger("preemption")


class PreemptionGuard:
    """Signal-to-flag bridge for graceful train-loop shutdown.

    Usage::

        guard = PreemptionGuard()           # installs SIGTERM by default
        trainer.fit(..., preemption_guard=guard)

    The handler is async-signal-safe (sets a ``threading.Event`` and
    returns); the expensive work — checkpointing and teardown — runs in the
    training loop's own thread at a step boundary. ``trigger()`` lets tests
    and external schedulers (e.g. a borg/k8s preStop hook calling into the
    process) request the same graceful stop without a signal.
    """

    def __init__(self, signals: Tuple[int, ...] = (signal.SIGTERM,),
                 install: bool = True):
        self._event = threading.Event()
        self._signals = tuple(signals)
        self._previous = {}
        self._installed = False
        if install:
            self.install()

    # -- handler management ------------------------------------------------
    def install(self) -> bool:
        """Install handlers; returns False if not on the main thread
        (signal.signal is main-thread-only) — the guard still works via
        :meth:`trigger`."""
        if self._installed:
            return True
        try:
            for sig in self._signals:
                self._previous[sig] = signal.signal(sig, self._handler)
            self._installed = True
        except ValueError:  # not the main thread
            logger.warning("PreemptionGuard: cannot install signal handlers "
                           "off the main thread; use trigger() instead")
            return False
        return True

    def uninstall(self) -> None:
        if not self._installed:
            return
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        self._previous.clear()
        self._installed = False

    def __enter__(self) -> "PreemptionGuard":
        self.install()
        return self

    def __exit__(self, *exc) -> None:
        self.uninstall()

    # -- state -------------------------------------------------------------
    def _handler(self, signum, frame) -> None:
        # async-signal-safe: set the flag, log nothing heavy here
        self._event.set()

    def trigger(self) -> None:
        """Request a graceful stop programmatically (tests / schedulers)."""
        self._event.set()

    def reset(self) -> None:
        self._event.clear()

    @property
    def triggered(self) -> bool:
        return self._event.is_set()


def skip_batches(loader: Iterable, n: int) -> Iterable:
    """Yield ``loader`` minus its first ``n`` items (mid-epoch fast-forward).

    The skipped batches are produced by the loader but never prepared,
    uploaded, or stepped — for host-synthesized graph batches this is
    orders of magnitude cheaper than the steps themselves.
    """
    it = iter(loader)
    for _ in range(n):
        try:
            next(it)
        except StopIteration:
            return
    yield from it
