"""Parity-mode build path (stem+stopwords — the reference-shaped pipeline,
data_manager.py:74-88): the pandas branch of tokenize_tf must equal the
shared frozen normalizer exactly."""

from information_retrieval_project_spark.corpus import generate_corpus, generate_pdf
from information_retrieval_project_spark.functions.textnorm import normalize_tokenize
from information_retrieval_project_spark.index.build import tokenize_tf, with_doc_id


def test_parity_tokenize_matches_python(spark):
    corpus = generate_corpus(spark, 80, partitions=2)
    ids = with_doc_id(corpus)
    tf = tokenize_tf(ids, strategy="code", stem=True, stopwords=True)
    engine = {}
    for r in tf.collect():
        engine.setdefault(r["doc_id"], {})[r["term"]] = r["tf"]

    pdf = generate_pdf(80)
    key_to_id = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in ids.select("repo", "path", "commit", "doc_id").collect()
    }
    for row in pdf.itertuples(index=False):
        doc_id = key_to_id[(row.repo, row.path, row.commit)]
        want = {}
        for t in normalize_tokenize(row.content, "code", stem=True, stopwords=True):
            want[t] = want.get(t, 0) + 1
        assert engine.get(doc_id, {}) == want, doc_id


def test_parity_mode_applies_stemming(spark):
    rows = [("r", "p", "c", "py", "running runs runner the and of")]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    tf = {r["term"]: r["tf"] for r in tokenize_tf(with_doc_id(corpus), stem=True, stopwords=True).collect()}
    assert "run" in tf  # running/runs stemmed
    assert "the" not in tf and "and" not in tf  # stopwords removed
