"""Crawler-shaped end-to-end demo (SURVEY.md §7.2 M6): the reference's
flagship use case (README.md:56-108 web crawler) — a cyclic pipeline
whose stage does bounded-concurrency async I/O — composed from the
engine's pieces: iterate_accumulate (cycle) + async_map_in_pandas
(max_task_count admission control) + anti-join dedup of the frontier
(the termination guarantee the reference leaves to user code)."""

from pyspark.sql import functions as F

from async_pipes_spark.operators.async_map import async_map_in_pandas
from async_pipes_spark.operators.iterate import iterate_accumulate

# A tiny deterministic "web": page -> links. Reachable from 'root':
# root, a, b, c, d (e is orphaned).
LINKS = {
    "root": ["a", "b"],
    "a": ["b", "c"],
    "b": ["c", "root"],
    "c": ["d"],
    "d": [],
    "e": ["a"],
}


def test_crawler_cycle_with_async_fetch(spark):
    async def fetch(rec):
        # stands in for an HTTP GET; returns the page's outlinks
        import asyncio

        await asyncio.sleep(0.001)
        return {"url": rec["url"], "links": LINKS.get(rec["url"], [])}

    visited = [spark.createDataFrame([("root",)], "url: string")]

    def step(frontier):
        fetched = async_map_in_pandas(
            frontier, fetch, "url string, links array<string>", max_task_count=10
        )
        discovered = fetched.select(F.explode("links").alias("url")).distinct()
        # frontier dedup: drop already-visited urls (guarantees
        # termination on cyclic link graphs)
        seen = visited[0]
        nxt = discovered.join(seen, "url", "left_anti")
        visited[0] = seen.unionByName(nxt).localCheckpoint(eager=True)
        return nxt

    crawled = iterate_accumulate(
        visited[0],
        step=step,
        emit=lambda df: df.select("url"),
        checkpoint_every=1,  # step mutates visited: must run eagerly in order
        max_iterations=20,
    )
    urls = sorted(r.url for r in crawled.collect())
    assert urls == ["a", "b", "c", "d", "root"]
