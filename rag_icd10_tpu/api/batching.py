"""Request-coalescing batcher.

Concurrent /query and /standardize requests landing within a small window
are merged into ONE device batch (one encoder forward + one fused search
scan via MultiDiagnosisService.match_many_texts). The reference has no
equivalent — every request is processed alone and sequentially.

Device work runs in a single worker thread: JAX dispatch is blocking, and
serializing it through one thread also guarantees jit-cache friendliness.
"""

from __future__ import annotations

import asyncio
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional


@dataclass
class _Pending:
    text: str
    top_k: int
    future: asyncio.Future = field(repr=False)


class RequestBatcher:
    """Collects match requests for up to ``window_ms`` / ``max_batch`` and
    executes them as one batch."""

    def __init__(
        self,
        matcher_fn: Callable[[List[str], int], List[Dict[str, Any]]],
        window_ms: float = 2.0,
        max_batch: int = 64,
    ):
        self.matcher_fn = matcher_fn
        self.window_s = window_ms / 1000.0
        self.max_batch = max_batch
        self.queue: "asyncio.Queue[_Pending]" = asyncio.Queue()
        self._task: Optional[asyncio.Task] = None
        # dedicated single worker thread: serializes device work (jit-cache
        # friendly) and can be abandoned on shutdown without hanging the
        # event loop's default executor (a SIGTERM during an in-flight XLA
        # compile must not wedge process teardown)
        self._executor = ThreadPoolExecutor(max_workers=1, thread_name_prefix="batcher")
        self.batches_served = 0
        self.requests_served = 0

    def start(self) -> None:
        if self._task is None:
            self._task = asyncio.get_event_loop().create_task(self._worker())

    async def stop(self) -> None:
        if self._task is not None:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None
        # don't wait for an in-flight device call; drop it
        self._executor.shutdown(wait=False, cancel_futures=True)

    async def submit(self, text: str, top_k: int) -> Dict[str, Any]:
        loop = asyncio.get_event_loop()
        pending = _Pending(text=text, top_k=top_k, future=loop.create_future())
        await self.queue.put(pending)
        return await pending.future

    async def _worker(self) -> None:
        while True:
            first = await self.queue.get()
            batch = [first]
            deadline = asyncio.get_event_loop().time() + self.window_s
            while len(batch) < self.max_batch:
                timeout = deadline - asyncio.get_event_loop().time()
                if timeout <= 0:
                    break
                try:
                    batch.append(
                        await asyncio.wait_for(self.queue.get(), timeout=timeout)
                    )
                except asyncio.TimeoutError:
                    break
            # requests may ask different top_k: run at the max, slice later
            top_k = max(p.top_k for p in batch)
            texts = [p.text for p in batch]
            try:
                results = await asyncio.get_event_loop().run_in_executor(
                    self._executor, self.matcher_fn, texts, top_k
                )
                for pending, result in zip(batch, results):
                    if pending.top_k < top_k:
                        for m in result.get("matches", []):
                            m.candidates = m.candidates[: pending.top_k]
                        result["total_matches"] = sum(
                            len(m.candidates) for m in result.get("matches", [])
                        )
                    if not pending.future.done():
                        pending.future.set_result(result)
            except Exception as e:
                for pending in batch:
                    if not pending.future.done():
                        pending.future.set_exception(e)
            self.batches_served += 1
            self.requests_served += len(batch)

    def stats(self) -> Dict[str, Any]:
        return {
            "batches_served": self.batches_served,
            "requests_served": self.requests_served,
            "avg_batch_size": (
                round(self.requests_served / self.batches_served, 2)
                if self.batches_served
                else 0.0
            ),
        }
