"""IPv4 / CIDR enrichment: longest-prefix match as bounded equi-joins.

Geo-IP and routing enrichment joins a fact table of IPv4 addresses
(u32) against a dim table of CIDR blocks (network, prefix_len).  The
naive formulation is a non-equi range join (ip BETWEEN net_lo AND
net_hi) — a nested-loop disaster at web scale.  The classical fix
(used by every router FIB and replayed here in DataFrame algebra):
partition the dim by prefix length.  For each DISTINCT prefix length
L present in the table, `ip >> (32 - L)` is an exact equi-join key
against the blocks of that length — so LPM becomes at most 33
hash/broadcast equi-joins (in practice ~6-10 lengths), followed by one
keyed window argmax on prefix_len.

Scale design:
- The fact side is deduplicated to distinct IPs first (10^12 page
  fetches -> ~10^9 distinct IPs), and the length fan-out multiplies
  rows by |distinct lengths| (bounded 33), not by |blocks|.
- The length list itself is O(33) — collected to the driver (bounded
  by the address width, not by data) and broadcast as a literal
  sequence.
- The dim (route table / geo-IP blocks, ~10^6 rows) broadcasts; above
  the broadcast threshold the same plan shape shuffles on the
  (len, masked) key.
- Duplicate blocks dedupe map-side by (prefix_len, network) keeping
  the smallest route id, so the argmax is deterministic.

Exactness: pure integer bit arithmetic (shifts and masks) in both
engines.

Ref parity: the reference resolves each address point to its commune
by containment in a polygon hierarchy (bano/sql/point_par_rue.sql);
LPM is the identical "most specific enclosing container wins"
semantics on the IPv4 trie instead of the admin-boundary tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["dedupe_blocks", "lpm_join", "subnet_rollup"]


def dedupe_blocks(blocks: DataFrame, net: str = "network",
                  plen: str = "prefix_len",
                  route: str = "route_id") -> DataFrame:
    """Canonicalize the route table: mask each network to its own
    prefix length and keep the smallest route id per (len, masked)."""
    return (blocks
            .withColumn("net_key",
                        F.expr(f"{net} >> (32 - {plen})").cast("bigint"))
            .groupBy(F.col(plen).alias("plen"), "net_key")
            .agg(F.min(route).cast("bigint").alias("route_id")))


def lpm_join(ips: DataFrame, blocks: DataFrame, ip: str = "ip",
             net: str = "network", plen: str = "prefix_len",
             route: str = "route_id") -> DataFrame:
    """Longest-prefix match: one row per input ip with the most
    specific matching block (route_id, plen) or NULLs when unrouted.

    ips must be distinct on `ip` (dedup-first contract).
    """
    dim = dedupe_blocks(blocks, net, plen, route)
    lens = sorted(r["plen"] for r in
                  dim.select("plen").distinct().collect())  # O(<=33)
    fan = ips.withColumn(
        "plen", F.explode(F.array(*[F.lit(v) for v in lens])))
    fan = fan.withColumn(
        "net_key", F.expr(f"{ip} >> (32 - plen)").cast("bigint"))
    hit = fan.join(F.broadcast(dim), ["plen", "net_key"])
    w = Window.partitionBy(ip).orderBy(F.col("plen").desc(),
                                       F.col("route_id").asc())
    best = (hit.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(ip, F.col("route_id"),
                    F.col("plen").cast("bigint").alias("matched_len")))
    return (ips.join(best, ip, "left")
            .select(ip, "route_id", "matched_len"))


def subnet_rollup(ips: DataFrame, ip: str = "ip") -> DataFrame:
    """Per-/16 rollup: ip count and distinct /24 count — the
    aggregation-level audit of an address population."""
    return (ips
            .withColumn("net16", F.expr(f"{ip} >> 16").cast("bigint"))
            .withColumn("net24", F.expr(f"{ip} >> 8").cast("bigint"))
            .groupBy("net16")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_ips"),
                 F.countDistinct("net24").cast("bigint")
                 .alias("n_slash24")))
