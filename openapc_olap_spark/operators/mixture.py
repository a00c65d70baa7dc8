"""Temperature-based corpus mixture resampling (SURVEY.md §2.9 X10/X23
family — the multilingual/multi-source rebalancing scheme of mT5/XLM-R:
sample strata proportionally to p_s^(1/T), flattening the head so
low-resource strata are not drowned; driver-mandated LLM-pipeline
surface, no reference equivalent).

Composes the existing deterministic machinery: the observed stratum
distribution (one stratum-sized aggregate) is raised to 1/T and fed to
packing.rebalance_mixture, which floors per-stratum keep rates to
permille and applies the md5-permille membership filter — so the output
is reproducible, engine-portable, and nestable exactly like every other
sampling operator here.

100 TB posture: two stratum-cardinality aggregates (the temperature
weights and rebalance's own count pass) plus one codegen'd scan filter;
the corpus never shuffles.

Engine-portability note: p_s^(1/T) is IEEE pow. For the certified gate,
T=2.0 makes the exponent exactly 0.5 (both engines compute the same
sqrt); arbitrary T is supported but the permille floor is the tolerance
that absorbs last-ulp pow differences, as with every rate here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openapc_olap_spark.operators import packing


def temperature_targets(df: DataFrame, strata_col: str,
                        temperature: float,
                        normalize: bool = True) -> dict[str, float]:
    """Target mixture weights t_s ∝ (n_s / N)^(1/temperature) over the
    observed strata. temperature=1 reproduces the corpus distribution;
    temperature→∞ approaches uniform; 0<T<1 sharpens the head. One
    stratum-sized aggregate (tiny collect, like reading a codebook).

    ``normalize=False`` returns the RAW p^(1/T) weights: pass those to
    mixture_fractions/rebalance_mixture, which normalize once themselves
    (with a sorted-key fold) — normalizing here too would divide by two
    different float sums, and the double rounding can flip a permille
    floor at a rate boundary (found by replaying the arithmetic against
    the x57 SQL oracle over random stratum sets)."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0: {temperature}")
    counts = {r[strata_col]: r["n"]
              for r in df.groupBy(strata_col)
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(counts.values())
    if n == 0:
        return {}
    w = {k: (c / n) ** (1.0 / temperature) for k, c in counts.items()}
    if not normalize:
        return w
    # sorted-key fold: deterministic across runs, replicable by an
    # ORDER BY fold in SQL (double addition is order-sensitive)
    z = 0.0
    for k in sorted(w):
        z += w[k]
    return {k: v / z for k, v in w.items()}


def temperature_resample(df: DataFrame, strata_col: str,
                         temperature: float, id_col: str = "doc_id",
                         salt: str = "temp") -> DataFrame:
    """Downsample to the temperature-flattened mixture. The rarest
    stratum (largest t_s/n_s ratio) is kept whole and every other
    stratum is downsampled toward it — the deterministic, no-upsampling
    reading of temperature sampling (epoch-level resampling schemes
    upsample instead; at 100 TB you downsample the head, not copy the
    tail)."""
    targets = temperature_targets(df, strata_col, temperature,
                                  normalize=False)
    return packing.rebalance_mixture(df, strata_col, targets,
                                     id_col=id_col, salt=salt)
