"""S7: dump-download planner/runner (download/download_wikidumps.sh parity) —
URL parsing, skip-existing resume, retries, atomic placement; fetch injected
(no network here)."""
import os

import pytest


URLS = [
    "https://dumps.example.org/wikidatawiki/20250601/"
    "wikidatawiki-20250601-pages-meta-history1.xml-p1p154.bz2",
    "https://dumps.example.org/wikidatawiki/20250601/"
    "wikidatawiki-20250601-pages-meta-history2.xml-p155p284.bz2",
    "https://dumps.example.org/other/odd-name.bin",
]


@pytest.fixture()
def url_list(tmp_path):
    p = str(tmp_path / "links.txt")
    with open(p, "w") as f:
        f.write("\n".join(URLS) + "\n")
    return p


def test_parse_and_plan(url_list, tmp_path):
    from wikidata_edit_history_ray.sources.download import plan_downloads

    dl = str(tmp_path / "dl")
    os.makedirs(dl)
    # pre-place the second file: the plan must mark it skipped
    open(os.path.join(dl, URLS[1].rsplit("/", 1)[-1]), "w").write("x")
    plan = plan_downloads(url_list, dl)
    assert [s["skipped"] for s in plan] == [False, True, False]
    assert plan[0]["dump_date"] == "20250601"
    assert plan[0]["shard"] == 1 and plan[1]["shard"] == 2
    assert (plan[0]["page_lo"], plan[0]["page_hi"]) == (1, 154)
    assert plan[2]["shard"] == -1  # non-standard name still downloadable


def test_run_with_injected_fetcher_and_resume(ray_session, url_list, tmp_path):
    from wikidata_edit_history_ray.sources.download import run_downloads

    dl = str(tmp_path / "dl")
    calls = []

    def fake_fetch(url, dest):
        calls.append(url)
        with open(dest, "wb") as f:
            f.write(url.encode() * 3)

    m = run_downloads(url_list, dl, fetcher=fake_fetch).take_all()
    assert len(m) == 3 and all(r["error"] == "" for r in m)
    assert all(r["bytes"] > 0 for r in m)
    assert sorted(os.listdir(dl)) == sorted(u.rsplit("/", 1)[-1] for u in URLS)

    # resume: second run fetches nothing
    m2 = run_downloads(url_list, dl, fetcher=fake_fetch).take_all()
    assert all(r["skipped"] for r in m2)


def test_flaky_fetcher_retries_then_reports(ray_session, url_list, tmp_path):
    from wikidata_edit_history_ray.sources.download import run_downloads

    dl = str(tmp_path / "dl")

    def always_fail(url, dest):
        raise OSError("connection reset")

    m = run_downloads(url_list, dl, fetcher=always_fail, max_tries=2).take_all()
    assert all(r["error"].startswith("OSError") for r in m)
    assert all(r["bytes"] == 0 for r in m)
    assert not any(f.endswith(".tmp") for f in os.listdir(dl))  # no debris


def test_default_fetcher_raises_clearly(ray_session, url_list, tmp_path):
    import ray.exceptions

    from wikidata_edit_history_ray.sources.download import run_downloads

    m = run_downloads(url_list, str(tmp_path / "dl")).take_all()
    assert all("NotImplementedError" in r["error"] for r in m)
