"""Profiler hooks for the CLIs.

The reference has no tracing/profiling at all (SURVEY.md §5 — progress bars
only); here every trainer and inference CLI takes ``--profile_dir``: when
set, a window of steps is captured with jax.profiler (XLA device trace +
a perfetto json.gz usable in ui.perfetto.dev or TensorBoard).
"""

from __future__ import annotations

import contextlib
import logging

__all__ = ["maybe_trace", "add_profile_args", "ProfileWindow"]


class ProfileWindow:
    """Captures steps [start_step, start_step + num_steps) of a loop —
    call ``tick(step)`` once per iteration and ``close()`` at the end.
    The default window skips step 0/1 so compilation stays out of the trace."""

    def __init__(self, profile_dir: str, num_steps: int = 5,
                 start_step: int = 2):
        self.dir = profile_dir
        self.start = start_step
        self.stop = start_step + num_steps
        self._active = False

    def tick(self, step: int) -> None:
        if not self.dir:
            return
        import jax

        if step == self.start and not self._active:
            logging.info("profiler: starting trace (%s)", self.dir)
            jax.profiler.start_trace(self.dir, create_perfetto_trace=True)
            self._active = True
        elif step >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
            logging.info("profiler: trace written to %s", self.dir)

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            logging.info("profiler: trace written to %s", self.dir)


def add_profile_args(parser) -> None:
    parser.add_argument(
        "--profile_dir", type=str, default="",
        help="write a jax.profiler trace of the profiled steps here "
             "(perfetto json.gz + xplane)")
    parser.add_argument(
        "--profile_steps", type=int, default=5,
        help="how many steps the trace window covers")


@contextlib.contextmanager
def maybe_trace(profile_dir: str):
    """Trace the enclosed block when profile_dir is set; no-op otherwise."""
    if not profile_dir:
        yield
        return
    import jax

    logging.info("Capturing jax.profiler trace to %s", profile_dir)
    with jax.profiler.trace(profile_dir, create_perfetto_trace=True):
        yield
    logging.info("Trace written to %s", profile_dir)
