"""Unit tests for the classifier-evaluation family — confusion matrix,
per-class P/R/F1, Cohen's kappa — on a hand-computed fixture.

The fixture drives the lang-ID heuristic to known predictions via its
marker words ('the'→en, 'data'→es, 'stream'→de) and includes a class
('fr') the classifier can never predict, so the zero-predicted spine
path is exercised."""

from __future__ import annotations

from pyspark.sql import Row

from algorithmproject_spark_spark.queries.evalmetrics import (
    langid_cohens_kappa,
    langid_confusion_matrix,
    langid_eval_prf,
)


def _doc(i, lang, text):
    return Row(
        doc_id=i, text=text, lang=lang, source="s", n_chars=len(text)
    )


def _fixture(spark, tmp_path):
    rows = [
        _doc(1, "en", "the the"),      # pred en  (tp)
        _doc(2, "en", "data table"),   # pred es  (en fn, es fp)
        _doc(3, "es", "data"),         # pred es  (tp)
        _doc(4, "de", "stream"),       # pred de  (tp)
        _doc(5, "fr", "stream"),       # pred de  (fr never predicted)
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_confusion_matrix_cells(spark, tmp_path):
    sf = _fixture(spark, tmp_path)
    got = {
        (r.true_lang, r.pred_lang): r.n_docs
        for r in langid_confusion_matrix(spark, sf).collect()
    }
    assert got == {
        ("en", "en"): 1,
        ("en", "es"): 1,
        ("es", "es"): 1,
        ("de", "de"): 1,
        ("fr", "de"): 1,
    }


def test_prf_per_class_exact(spark, tmp_path):
    sf = _fixture(spark, tmp_path)
    got = {
        r.cls: (
            r.n_true, r.n_pred, r.n_tp,
            r.precision_e6, r.recall_e6, r.f1_e6,
        )
        for r in langid_eval_prf(spark, sf).collect()
    }
    assert got == {
        # f1 = 2·tp·1e6 // (n_true + n_pred), single floor
        "en": (2, 1, 1, 1_000_000, 500_000, 666_666),
        "es": (1, 2, 1, 500_000, 1_000_000, 666_666),
        "de": (1, 2, 1, 500_000, 1_000_000, 666_666),
        "fr": (1, 0, 0, 0, 0, 0),
    }


def test_kappa_floor_composition(spark, tmp_path):
    sf = _fixture(spark, tmp_path)
    [row] = langid_cohens_kappa(spark, sf).collect()
    # po = 3/5 → 600000. pe terms (inner join drops fr: never
    # predicted): en 400000·200000//1e6 + es/de 200000·400000//1e6
    # each = 80000·3 = 240000. kappa = 360000·1e6 // 760000 = 473684.
    assert (row.n_docs, row.po_e6, row.pe_e6, row.kappa_e6) == (
        5, 600_000, 240_000, 473_684,
    )


def test_kappa_negative_when_agreement_below_chance(spark, tmp_path):
    # Systematic disagreement: every en doc predicted es and vice
    # versa → agree 0, po 0, kappa < 0 — the sign-split division path.
    rows = [
        _doc(1, "en", "data"),    # pred es
        _doc(2, "es", "the"),     # pred en
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    [row] = langid_cohens_kappa(spark, str(tmp_path)).collect()
    # po 0; pe: en 500000·500000//1e6 + es same = 500000.
    # kappa = -(500000·1e6 // 500000) = -1000000.
    assert (row.po_e6, row.pe_e6, row.kappa_e6) == (0, 500_000, -1_000_000)
