"""Recall / cluster-quality metrics against generator ground truth.

Dup-pair recall (BASELINE.json target >= 0.99): fraction of true
duplicate pairs — exact + near pairs at/above the verify threshold,
plus all within-template pairs — whose endpoints share a predicted
cluster label.  Template pairs are counted combinatorially from
label agreement (enumerating C(n,2) pairs explicitly is unnecessary).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd


@dataclass
class RecallReport:
    n_truth_pairs: int
    n_found: int
    recall: float
    per_kind: dict[str, float]
    false_merges: int   # predicted-cluster pairs that are truth negatives


def pair_recall(
    labels: pd.DataFrame,          # url, cluster_id (predicted)
    truth_pairs: pd.DataFrame,     # url_a, url_b, kind, jaccard
    truth_clusters: pd.DataFrame,  # url, cluster_id (ground truth)
    verify_threshold: float = 0.8,
) -> RecallReport:
    lab = dict(zip(labels["url"], labels["cluster_id"]))

    per_kind_tot: dict[str, int] = {}
    per_kind_hit: dict[str, int] = {}

    def count(kind: str, a: str, b: str) -> None:
        per_kind_tot[kind] = per_kind_tot.get(kind, 0) + 1
        if lab.get(a) is not None and lab.get(a) == lab.get(b):
            per_kind_hit[kind] = per_kind_hit.get(kind, 0) + 1

    mask = (truth_pairs["kind"] == "exact") | (
        (truth_pairs["kind"] == "near") & (truth_pairs["jaccard"] >= verify_threshold)
    )
    for a, b, k in truth_pairs.loc[mask, ["url_a", "url_b", "kind"]].itertuples(index=False):
        count(k, a, b)

    # template class: all C(n,2) pairs within each truth cluster that is
    # not already covered by an explicit truth pair of ANY kind — count
    # via label groups.  Excluding only exact-pair urls would double-count
    # near pairs (once as 'near', again as 'template') and pull
    # sub-threshold near pairs into the denominator.
    paired_urls = set(truth_pairs.loc[truth_pairs["kind"] != "negative", "url_a"]) | set(
        truth_pairs.loc[truth_pairs["kind"] != "negative", "url_b"]
    )
    for cid, grp in truth_clusters.groupby("cluster_id"):
        urls = [u for u in grp["url"] if u not in paired_urls]
        if len(urls) < 2:
            continue
        n = len(urls)
        tot = n * (n - 1) // 2
        # pairs found = sum over predicted labels of C(m,2)
        pred = pd.Series([lab.get(u) for u in urls]).dropna().value_counts()
        hit = int((pred * (pred - 1) // 2).sum())
        k = "template"
        per_kind_tot[k] = per_kind_tot.get(k, 0) + tot
        per_kind_hit[k] = per_kind_hit.get(k, 0) + hit

    # false merges: negative truth pairs that ended up co-clustered
    negs = truth_pairs[truth_pairs["kind"] == "negative"]
    false_merges = sum(
        1 for a, b in negs[["url_a", "url_b"]].itertuples(index=False)
        if lab.get(a) is not None and lab.get(a) == lab.get(b)
    )

    tot = sum(per_kind_tot.values())
    hit = sum(per_kind_hit.get(k, 0) for k in per_kind_tot)
    return RecallReport(
        n_truth_pairs=tot,
        n_found=hit,
        recall=hit / tot if tot else 1.0,
        per_kind={
            k: (per_kind_hit.get(k, 0) / v if v else 1.0)
            for k, v in per_kind_tot.items()
        },
        false_merges=false_merges,
    )
