"""Seed-list readers (queue/item.go:53-102 FileToItems semantics)."""

import pytest

from zeno_ray.sources import (
    EmptySeedListError,
    read_seed_file,
    seeds_from_lines,
)


def test_seeds_from_lines_skips_invalid_counts():
    seeds, skipped = seeds_from_lines([
        "https://a.example/x",
        "   https://b.example/y  ",
        "notaurl",
        "ftp://c.example/z",
        "",
        "# comment",
    ])
    assert seeds == ["https://a.example/x", "https://b.example/y"]
    assert skipped == 2


def test_empty_seed_list_raises():
    with pytest.raises(EmptySeedListError):
        seeds_from_lines(["", "notaurl"])


def test_read_seed_file(tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text("https://a.example/1\nbadurl\nhttps://b.example/2\n")
    seeds, skipped = read_seed_file(str(p))
    assert seeds == ["https://a.example/1", "https://b.example/2"]
    assert skipped == 1


@pytest.mark.usefixtures("ray_session")
def test_read_seed_dataset(tmp_path):
    from zeno_ray.sources import read_seed_dataset

    p = tmp_path / "seeds.txt"
    p.write_text("\n".join(
        [f"https://h{i}.example/" for i in range(50)] + ["junk", "ftp://no"]))
    ds = read_seed_dataset(str(p))
    urls = ds.to_pandas()["url"].tolist()
    assert len(urls) == 50
    assert urls[0] == "https://h0.example/"
