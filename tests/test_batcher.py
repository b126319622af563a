"""RequestBatcher overload/timeout/grouping/drain behavior.

SURVEY.md §5 failure-detection row: the batcher must shed load with a
bounded queue (503), time out requests stuck behind slow batches (504),
coalesce requests with identical per-request search knobs, and drain
gracefully on shutdown.
"""

import asyncio
import time

import pytest

from rag_icd10_tpu.api.batching import (
    BatcherOverloaded,
    BatcherTimeout,
    RequestBatcher,
)


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def echo_matcher(texts, top_k, search_method=None, ef_search=None):
    return [
        {
            "matches": [],
            "extracted_diagnoses": [t],
            "total_matches": 0,
            "knobs": (search_method, ef_search),
            "batch_size": len(texts),
        }
        for t in texts
    ]


class TestBatching:
    def test_coalesces_within_window(self):
        async def go():
            b = RequestBatcher(echo_matcher, window_ms=30.0, max_batch=8)
            b.start()
            results = await asyncio.gather(
                *(b.submit(f"t{i}", 5) for i in range(4))
            )
            await b.stop()
            return results, b

        results, b = run(go())
        assert [r["extracted_diagnoses"] for r in results] == [
            ["t0"], ["t1"], ["t2"], ["t3"]
        ]
        # all four landed in one device batch
        assert results[0]["batch_size"] == 4
        assert b.stats()["batches_served"] == 1

    def test_knob_groups_split_batches(self):
        async def go():
            b = RequestBatcher(echo_matcher, window_ms=30.0, max_batch=8)
            b.start()
            results = await asyncio.gather(
                b.submit("a", 5),
                b.submit("b", 5, search_method="hnsw", ef_search=32),
                b.submit("c", 5),
                b.submit("d", 5, search_method="hnsw", ef_search=32),
            )
            await b.stop()
            return results, b

        results, b = run(go())
        assert results[0]["knobs"] == (None, None)
        assert results[1]["knobs"] == ("hnsw", 32)
        # same window, but two knob groups -> two matcher calls
        assert results[0]["batch_size"] == 2
        assert results[1]["batch_size"] == 2
        assert b.stats()["batches_served"] == 2

    def test_knob_unaware_matcher_fallback(self):
        def legacy(texts, top_k):
            return [
                {"matches": [], "extracted_diagnoses": [t], "total_matches": 0}
                for t in texts
            ]

        async def go():
            b = RequestBatcher(legacy, window_ms=1.0)
            b.start()
            r = await b.submit("x", 5, search_method="hnsw")
            await b.stop()
            return r

        assert run(go())["extracted_diagnoses"] == ["x"]


class StageMatcher:
    """Three-stage matcher recording a timeline, for pipelining tests."""

    def __init__(self, device_s=0.15, host_s=0.05):
        self.device_s = device_s
        self.host_s = host_s
        self.events = []  # (stage, phase, texts, t)
        self.t0 = time.monotonic()

    def _mark(self, stage, phase, texts):
        self.events.append((stage, phase, tuple(texts), time.monotonic() - self.t0))

    def extract_stage(self, texts):
        self._mark("extract", "start", texts)
        time.sleep(self.host_s)
        self._mark("extract", "end", texts)
        return {"texts": list(texts)}

    def device_stage(self, state, top_k, search_method=None, ef_search=None):
        self._mark("device", "start", state["texts"])
        time.sleep(self.device_s)  # simulated device wait (releases GIL)
        self._mark("device", "end", state["texts"])
        return state

    def rescore_stage(self, state, top_k):
        self._mark("rescore", "start", state["texts"])
        time.sleep(self.host_s)
        self._mark("rescore", "end", state["texts"])
        return echo_matcher(state["texts"], top_k)

    def match_many_texts(self, texts, top_k, search_method=None, ef_search=None):
        state = self.extract_stage(texts)
        self.device_stage(state, top_k, search_method, ef_search)
        return self.rescore_stage(state, top_k)


class TestPipelining:
    def test_stage_pipeline_results_correct(self):
        m = StageMatcher(device_s=0.02, host_s=0.005)

        async def go():
            b = RequestBatcher(m.match_many_texts, window_ms=5.0, max_batch=4)
            assert b.stats()["pipelined"] is True
            b.start()
            results = await asyncio.gather(
                *(b.submit(f"t{i}", 5) for i in range(12))
            )
            await b.stop()
            return results

        results = run(go())
        assert [r["extracted_diagnoses"] for r in results] == [
            [f"t{i}"] for i in range(12)
        ]

    def test_next_batch_extraction_overlaps_device_wait(self):
        """With two batches submitted back-to-back, batch 2's extraction
        must START before batch 1's device stage ENDS — the overlap that
        makes steady-state throughput max(device, host) not their sum."""
        m = StageMatcher(device_s=0.2, host_s=0.02)

        async def go():
            b = RequestBatcher(m.match_many_texts, window_ms=1.0, max_batch=1)
            b.start()
            t1 = asyncio.create_task(b.submit("a", 5))
            await asyncio.sleep(0.05)  # batch 1 reaches its device stage
            t2 = asyncio.create_task(b.submit("b", 5))
            await asyncio.gather(t1, t2)
            await b.stop()

        run(go())
        times = {
            (ev[0], ev[1], ev[2]): ev[3] for ev in m.events
        }
        dev1_end = times[("device", "end", ("a",))]
        ext2_start = times[("extract", "start", ("b",))]
        assert ext2_start < dev1_end, m.events

    def test_plain_function_matcher_not_pipelined(self):
        async def go():
            b = RequestBatcher(echo_matcher, window_ms=5.0, max_batch=4)
            piped = b.stats()["pipelined"]
            b.start()
            out = await b.submit("x", 5)
            await b.stop()
            return piped, out

        piped, out = run(go())
        assert piped is False
        assert out["extracted_diagnoses"] == ["x"]


class TestOverload:
    def test_queue_full_rejects(self):
        def slow(texts, top_k, **kw):
            time.sleep(0.3)
            return echo_matcher(texts, top_k)

        async def go():
            # max_inflight=1: the strict pre-pipelining overload contract
            # (one batch on the device, max_queue waiting, next rejects)
            b = RequestBatcher(
                slow, window_ms=1.0, max_batch=1, max_queue=2, max_inflight=1
            )
            b.start()
            t1 = asyncio.create_task(b.submit("a", 5))
            await asyncio.sleep(0.05)  # worker picks up "a", device busy
            t2 = asyncio.create_task(b.submit("b", 5))
            t3 = asyncio.create_task(b.submit("c", 5))
            await asyncio.sleep(0.01)
            with pytest.raises(BatcherOverloaded):
                await b.submit("d", 5)
            rejected = b.stats()["requests_rejected"]
            await asyncio.gather(t1, t2, t3)
            await b.stop()
            return rejected

        assert run(go()) == 1

    def test_request_timeout(self):
        def stuck(texts, top_k, **kw):
            time.sleep(1.0)  # simulates a cold-compile stall
            return echo_matcher(texts, top_k)

        async def go():
            b = RequestBatcher(
                stuck, window_ms=1.0, request_timeout_s=0.1, drain_timeout_s=0.1
            )
            b.start()
            with pytest.raises(BatcherTimeout):
                await b.submit("a", 5)
            stats = b.stats()
            await b.stop()
            return stats

        assert run(go())["requests_timed_out"] == 1

    def test_submit_after_stop_rejected(self):
        async def go():
            b = RequestBatcher(echo_matcher, window_ms=1.0)
            b.start()
            await b.stop()
            with pytest.raises(BatcherOverloaded):
                await b.submit("a", 5)

        run(go())


class TestDrain:
    def test_drain_completes_inflight(self):
        def slowish(texts, top_k, **kw):
            time.sleep(0.15)
            return echo_matcher(texts, top_k)

        async def go():
            b = RequestBatcher(slowish, window_ms=1.0, drain_timeout_s=2.0)
            b.start()
            task = asyncio.create_task(b.submit("a", 5))
            await asyncio.sleep(0.05)  # in-flight on the device thread
            t0 = time.monotonic()
            await b.stop()
            elapsed = time.monotonic() - t0
            result = await task
            return result, elapsed

        result, elapsed = run(go())
        # the in-flight request was delivered, and stop didn't burn the
        # whole drain window after it finished
        assert result["extracted_diagnoses"] == ["a"]
        assert elapsed < 1.5

    def test_drain_timeout_fails_queued(self):
        def very_slow(texts, top_k, **kw):
            time.sleep(1.0)
            return echo_matcher(texts, top_k)

        async def go():
            b = RequestBatcher(
                very_slow, window_ms=1.0, max_batch=1, drain_timeout_s=0.05
            )
            b.start()
            t1 = asyncio.create_task(b.submit("a", 5))
            await asyncio.sleep(0.02)
            t2 = asyncio.create_task(b.submit("b", 5))
            await asyncio.sleep(0.01)
            await b.stop()
            # the queued (never-started) request fails instead of hanging
            with pytest.raises((BatcherTimeout, BatcherOverloaded)):
                await t2
            t1.cancel()

        run(go())


class TestPipelineDepthKnob:
    def test_depth1_disables_staged_path(self):
        """PIPELINE_DEPTH=1 is the serving A/B control: the batcher must
        fall back to the monolithic matcher path, not staged-but-serial."""
        m = StageMatcher(device_s=0.005, host_s=0.002)

        async def go():
            b = RequestBatcher(
                m.match_many_texts, window_ms=5.0, max_batch=4,
                max_inflight=1,
            )
            assert b.stats()["pipelined"] is False
            b.start()
            results = await asyncio.gather(
                *(b.submit(f"t{i}", 5) for i in range(8))
            )
            await b.stop()
            return results

        results = run(go())
        assert [r["extracted_diagnoses"] for r in results] == [
            [f"t{i}"] for i in range(8)
        ]
