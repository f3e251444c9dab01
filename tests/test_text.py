"""Text layer: Persian processing, chunking, PDF extraction."""
import numpy as np
import zlib

from persian_rag_tpu.text.chunking import TextChunker
from persian_rag_tpu.text.pdf import extract_pdf_text
from persian_rag_tpu.text.persian import PersianTextProcessor, fold_persian_digits


def test_normalize_collapses_whitespace_and_folds_arabic():
    p = PersianTextProcessor()
    assert p.normalize_text("سلام\n\nدنيا   خوب") == "سلام دنیا خوب"
    assert p.normalize_text("كتاب") == "کتاب"
    assert p.normalize_text("") == ""


def test_tokenize_words_separates_punctuation():
    p = PersianTextProcessor()
    tokens = p.tokenize_words("سلام، دنیا! خوبی؟")
    assert "سلام" in tokens and "،" in tokens and "دنیا" in tokens


def test_tokenize_sentences():
    p = PersianTextProcessor()
    sents = p.tokenize_sentences("جمله اول است. جمله دوم است؟ جمله سوم")
    assert len(sents) == 3
    assert sents[0].endswith(".")
    assert sents[1].endswith("؟")


def test_fold_persian_digits():
    assert fold_persian_digits("۱۲۳ و ۰") == "123 و 0"


CFG = {
    "chunking": {
        "word_chunk_size": 10,
        "word_overlap": 3,
        "sentences_per_chunk": 2,
    }
}


def test_word_chunking_sizes_and_overlap():
    text = " ".join(f"کلمه{i}" for i in range(40))
    chunker = TextChunker(CFG)
    chunks = chunker.word_based_chunking(text)
    assert all(c["num_words"] == 10 for c in chunks[:-1])
    # consecutive chunks share the overlap words
    w0 = chunks[0]["text"].split()
    w1 = chunks[1]["text"].split()
    assert w0[-3:] == w1[:3]
    assert chunks[0]["id"] == "word_chunk_0"
    assert chunks[1]["overlap_words"] == 3
    # stride 7 over 40 words -> full chunks at 0,7,14,21,28; the 5-word
    # tail (3 overlap + 2 new) is dropped by the >=10-word tail rule
    assert len(chunks) == 5
    seen = set()
    for c in chunks:
        seen.update(c["text"].split())
    assert f"کلمه{37}" in seen and f"کلمه{39}" not in seen


def test_word_chunking_tail_rule():
    # 15 words, chunk 10 overlap 3: chunk0 (words 0-9), leftover
    # 3 overlap + 5 new = 8 < 10 -> dropped
    text = " ".join(f"w{i}" for i in range(15))
    chunks = TextChunker(CFG).word_based_chunking(text)
    assert len(chunks) == 1
    # 13 fresh words after chunk0 -> tail reaches 10 via overlap carry:
    # 20 words: chunk0 (0-9), tail = 3 overlap + 10 new = 13 >= 10 ->
    # second full chunk at words 7-16, leftover 3+3=6 -> dropped
    text = " ".join(f"w{i}" for i in range(20))
    chunks = TextChunker(CFG).word_based_chunking(text)
    assert len(chunks) == 2


def test_sentence_chunking():
    text = "جمله یک است. جمله دو است. جمله سه است. جمله چهار است. جمله پنج است."
    chunks = TextChunker(CFG).sentence_based_chunking(text)
    assert len(chunks) == 3  # 5 sentences / 2 per chunk
    assert chunks[0]["num_sentences"] == 2
    assert chunks[-1]["num_sentences"] == 1
    assert chunks[0]["chunk_type"] == "sentence_based"


def test_chunk_statistics():
    text = " ".join(f"کلمه{i}" for i in range(40))
    chunker = TextChunker(CFG)
    chunks = chunker.word_based_chunking(text)
    stats = chunker.get_chunk_statistics(chunks)
    assert stats["total_chunks"] == len(chunks)
    assert stats["chunk_type"] == "word_based"
    assert stats["min_words_per_chunk"] >= 1


def test_chunk_csv_roundtrip(tmp_path):
    text = " ".join(f"کلمه{i}" for i in range(40))
    chunker = TextChunker(CFG)
    chunks = chunker.word_based_chunking(text)
    path = chunker.save_chunks(chunks, "c.csv", directory=str(tmp_path))
    loaded = chunker.load_chunks(path)
    assert len(loaded) == len(chunks)
    assert loaded[0]["text"] == chunks[0]["text"]


def _make_pdf(tmp_path, text: str, compress: bool) -> str:
    """Minimal single-page PDF with one content stream."""
    content = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode("latin-1")
    if compress:
        stream = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    else:
        stream = content
        filt = b""
    objects = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n",
        b"4 0 obj << "
        + filt
        + f"/Length {len(stream)} >> stream\n".encode()
        + stream
        + b"\nendstream endobj\n",
    ]
    pdf = b"%PDF-1.4\n" + b"".join(objects) + b"%%EOF\n"
    path = tmp_path / f"t{compress}.pdf"
    path.write_bytes(pdf)
    return str(path)


def test_pdf_extraction_plain_and_flate(tmp_path):
    for compress in (False, True):
        path = _make_pdf(tmp_path, "Hello drug information world", compress)
        text = extract_pdf_text(path)
        assert "Hello drug information world" in text
