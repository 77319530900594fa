"""Pure-numpy oracle reimplementing the reference evaluator's per-user loop.

Written from the reference formulas (Base/Evaluation/metrics.py,
Base/Evaluation/Evaluator.py:234-397) as an independent check of the
vectorized device evaluator: same rankings, same per-user metric math,
same finalization. Used only by tests.
"""

import numpy as np


def _dcg(scores):
    return np.sum(
        np.divide(np.power(2, scores) - 1, np.log(np.arange(scores.shape[0], dtype=np.float64) + 2)),
        dtype=np.float64,
    )


def _ndcg(ranked_list, pos_items, relevance, at):
    it2rel = {it: r for it, r in zip(pos_items, relevance)}
    rank_scores = np.asarray([it2rel.get(it, 0.0) for it in ranked_list[:at]], dtype=np.float64)
    ideal_dcg = _dcg(np.sort(relevance)[::-1][: len(ranked_list)])
    rank_dcg = _dcg(rank_scores)
    if rank_dcg == 0.0:
        return 0.0
    return rank_dcg / ideal_dcg


def _roc_auc(is_relevant):
    ranks = np.arange(len(is_relevant))
    pos_ranks = ranks[is_relevant]
    neg_ranks = ranks[~is_relevant]
    if len(neg_ranks) == 0:
        return 1.0
    score = 0.0
    if len(pos_ranks) > 0:
        for p in pos_ranks:
            score += np.sum(p < neg_ranks)
        score /= len(pos_ranks) * len(neg_ranks)
    return score


def reference_evaluate(scores_full, urm_train, urm_test, cutoffs):
    """Evaluate dense scores the way the reference evaluator does.

    scores_full: [n_users, n_items] raw model scores (no masking applied).
    Returns {cutoff: {metric: value}} for the user-averaged metrics plus the
    counter metrics.
    """
    urm_train = urm_train.tocsr()
    urm_test = urm_test.tocsr()
    n_users, n_items = urm_test.shape
    max_cutoff = max(cutoffs)

    users = np.where(np.ediff1d(urm_test.indptr) >= 1)[0]

    sums = {
        c: dict(
            ROC_AUC=0.0, PRECISION=0.0, PRECISION_RECALL_MIN_DEN=0.0, RECALL=0.0,
            MAP=0.0, MRR=0.0, NDCG=0.0, HIT_RATE=0.0, ARHR=0.0, RMSE=0.0,
            NOVELTY=0.0, AVERAGE_POPULARITY=0.0,
        )
        for c in cutoffs
    }
    counters = {c: np.zeros(n_items) for c in cutoffs}
    covered = {c: 0 for c in cutoffs}

    pop = np.ediff1d(urm_train.tocsc().indptr).astype(np.float64)
    total_inter = pop.sum()
    pop_norm = pop / pop.max()

    for u in users:
        scores = scores_full[u].astype(np.float64).copy()
        seen = urm_train.indices[urm_train.indptr[u] : urm_train.indptr[u + 1]]
        scores[seen] = -np.inf

        relevant_items = urm_test.indices[urm_test.indptr[u] : urm_test.indptr[u + 1]]
        relevant_ratings = urm_test.data[urm_test.indptr[u] : urm_test.indptr[u + 1]]

        # rmse over test items with finite scores
        err = (scores_full[u][relevant_items] - relevant_ratings) ** 2
        fin = np.isfinite(err)
        user_rmse = np.sqrt(err[fin].sum() / fin.sum()) if fin.sum() else np.nan

        part = np.argpartition(-scores, max_cutoff)[:max_cutoff]
        ranking = part[np.argsort(-scores[part], kind="stable")]
        ranking = ranking[np.isfinite(scores[ranking])]

        is_rel = np.isin(ranking, relevant_items, assume_unique=True)

        for c in cutoffs:
            rel_c = is_rel[:c]
            rec_c = ranking[:c]
            n_pos = len(relevant_items)
            s = sums[c]

            s["ROC_AUC"] += _roc_auc(rel_c)
            s["PRECISION"] += rel_c.sum() / len(rel_c) if len(rel_c) else 0.0
            s["PRECISION_RECALL_MIN_DEN"] += (
                rel_c.sum() / min(n_pos, len(rel_c)) if len(rel_c) else 0.0
            )
            s["RECALL"] += rel_c.sum() / n_pos
            if len(rel_c):
                p_at_k = rel_c * np.cumsum(rel_c) / (1 + np.arange(len(rel_c)))
                s["MAP"] += p_at_k.sum() / min(n_pos, len(rel_c))
            ranks = np.arange(1, len(rel_c) + 1)[rel_c]
            s["MRR"] += 1.0 / ranks[0] if len(ranks) else 0.0
            s["NDCG"] += _ndcg(rec_c, relevant_items, relevant_ratings, c)
            s["HIT_RATE"] += rel_c.sum()
            s["ARHR"] += (rel_c / np.arange(1, len(rel_c) + 1)).sum() if len(rel_c) else 0.0
            s["RMSE"] += user_rmse

            if len(rec_c):
                probs = pop[rec_c] / total_inter
                probs = probs[probs != 0]
                s["NOVELTY"] += np.sum(-np.log2(probs) / n_items)
                s["AVERAGE_POPULARITY"] += pop_norm[rec_c].sum() / len(rec_c)
                counters[c][rec_c] += 1
                covered[c] += 1

    n_eval = len(users)
    out = {}
    for c in cutoffs:
        res = {k: v / n_eval for k, v in sums[c].items()}
        cnt = counters[c]
        res["COVERAGE_ITEM"] = (cnt > 0).sum() / n_items
        res["COVERAGE_USER"] = covered[c] / n_users
        total = cnt.sum()
        res["DIVERSITY_HERFINDAHL"] = 1 - np.sum((cnt / total) ** 2) if total else np.nan
        nz = np.sort(cnt[cnt > 0])
        n = len(nz)
        index = np.arange(1, n + 1)
        res["DIVERSITY_GINI"] = 2 * np.sum((n + 1 - index) / (n + 1) * nz / nz.sum())
        p = nz / nz.sum()
        res["SHANNON_ENTROPY"] = -np.sum(p * np.log2(p))
        cooc = np.sum(cnt**2) - n_eval * c
        pairs = n_eval**2 - n_eval
        res["DIVERSITY_MEAN_INTER_LIST"] = (pairs - cooc / c) / pairs
        pr, re = res["PRECISION"], res["RECALL"]
        res["F1"] = 2 * pr * re / (pr + re) if pr + re else 0.0
        out[c] = res
    return out
