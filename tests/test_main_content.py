"""jusText-style main-content extraction
(functions/html.justext_blocks, pipelines/web.main_content)."""

import pyarrow as pa

from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.html import (
    justext_blocks,
)

SW = ("the", "and", "of", "to", "a", "in", "is", "with")
PH = "the sun is warm and the breeze is soft in the quiet garden of our town "
GOOD = (PH * 3).strip()
NAV = '<a href="https://x.com/a">Home</a> <a href="https://x.com/b">About</a>'
SHORT = "Short note only."
NEAR = PH.strip()


def page(*blocks):
    return ("<html><body>" + "".join(f"<p>{b}</p>" for b in blocks)
            + "</body></html>").encode()


def labels(html):
    return [lb for _, lb in justext_blocks(html, SW)]


class TestJustextBlocks:
    def test_context_free_classes(self):
        assert labels(page(GOOD)) == ["good"]
        assert labels(page(NAV)) == ["bad"]              # link-dense
        # stopword-free long block is bad
        assert labels(page("zebra " * 40)) == ["bad"]
        # copyright block is bad
        assert labels(page(GOOD + " © 2024")) == ["bad"]

    def test_short_rescued_only_between_good(self):
        assert labels(page(GOOD, SHORT, GOOD)) == ["good"] * 3
        assert labels(page(NAV, SHORT, GOOD)) == ["bad", "bad", "good"]
        assert labels(page(SHORT, GOOD)) == ["bad", "good"]

    def test_neargood_rescued_by_either_side(self):
        assert labels(page(GOOD, NEAR)) == ["good", "good"]
        assert labels(page(NEAR, GOOD)) == ["good", "good"]
        assert labels(page(NAV, NEAR)) == ["bad", "bad"]

    def test_short_with_link_is_bad(self):
        short_link = 'See <a href="https://x.com/y">y</a>.'
        assert labels(page(GOOD, short_link, GOOD)) == [
            "good", "bad", "good"]

    def test_script_and_style_ignored(self):
        html = (b"<html><body><script>var x = 1;</script><p>"
                + GOOD.encode() + b"</p></body></html>")
        assert labels(html) == ["good"]


class TestMainContentPipeline:
    def test_extraction(self, ray_session):
        import ray

        from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.web import (
            main_content,
        )

        pages = ray.data.from_items([
            {"url": "https://a.com/1", "html": page(GOOD, NEAR, NAV)},
            {"url": "https://a.com/2", "html": page(NAV)},
        ])
        out = {r["url"]: r
               for r in main_content(pages, stopwords=SW).take_all()}
        assert out["https://a.com/1"]["main_text"] == (
            GOOD + "\n\n" + NEAR)
        assert out["https://a.com/1"]["n_blocks"] == 3
        assert out["https://a.com/1"]["n_good"] == 2
        assert out["https://a.com/2"]["main_text"] == ""
        assert out["https://a.com/2"]["n_good"] == 0
