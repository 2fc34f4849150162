"""CSV reader edge cases — the twin of the reference's dataframe CSV tests
(test/unit/nnc/dataframe.addons.tests.c CSV cases; parser
lib/nnc/ccv_cnnp_dataframe_csv.c:531 two-pass parallel + double-quote mode).
"""

import os

import numpy as np
import pytest

from ccv_tpu.nn.dataframe import Dataframe


def _write(tmp_path, text, name="t.csv", binary=False):
    p = os.path.join(tmp_path, name)
    with open(p, "wb" if binary else "w", newline="") as f:
        f.write(text)
    return p


def test_basic_header(tmp_path):
    df = Dataframe.from_csv(_write(tmp_path, "a,b\n1,2\n3,4\n"))
    assert df.n == 2
    assert df.row(0, ["a", "b"]) == ("1", "2")
    assert df.row(1, ["a", "b"]) == ("3", "4")


def test_no_header(tmp_path):
    df = Dataframe.from_csv(_write(tmp_path, "1,2\n3,4\n"), header=False)
    assert df.n == 2
    assert df.row(0, ["0", "1"]) == ("1", "2")


def test_empty_file(tmp_path):
    df = Dataframe.from_csv(_write(tmp_path, ""))
    assert df.n == 0


def test_no_trailing_newline(tmp_path):
    df = Dataframe.from_csv(_write(tmp_path, "a,b\n1,2\n3,4"))
    assert df.n == 2
    assert df.row(1, ["a", "b"]) == ("3", "4")


def test_crlf_line_endings(tmp_path):
    df = Dataframe.from_csv(_write(tmp_path, "a,b\r\n1,2\r\n3,4\r\n"))
    assert df.n == 2
    assert df.row(0, ["a", "b"]) == ("1", "2")
    assert df.row(1, ["b"]) == ("4",)


def test_quoted_fields_with_delims(tmp_path):
    # the double_quotes mode of the reference parser
    df = Dataframe.from_csv(
        _write(tmp_path, 'a,b\n"x,y",2\n"line\nbreak",4\n'))
    assert df.n == 2
    assert df.row(0, ["a"]) == ("x,y",)
    assert df.row(1, ["a"]) == ("line\nbreak",)


def test_quoted_escaped_quotes(tmp_path):
    df = Dataframe.from_csv(_write(tmp_path, 'a,b\n"he said ""hi""",2\n'))
    assert df.row(0, ["a"]) == ('he said "hi"',)


def test_ragged_rows_fall_back(tmp_path):
    # short rows pad with "" (the reference zero-fills missing fields)
    df = Dataframe.from_csv(_write(tmp_path, "a,b,c\n1,2,3\n4,5\n6\n"))
    assert df.n == 3
    assert df.row(1, ["a", "b", "c"]) == ("4", "5", "")
    assert df.row(2, ["a", "b", "c"]) == ("6", "", "")


def test_empty_fields(tmp_path):
    df = Dataframe.from_csv(_write(tmp_path, "a,b,c\n,,\n1,,3\n"))
    assert df.row(0, ["a", "b", "c"]) == ("", "", "")
    assert df.row(1, ["a", "b", "c"]) == ("1", "", "3")


def test_single_column(tmp_path):
    df = Dataframe.from_csv(_write(tmp_path, "x\nalpha\nbeta\n"))
    assert df.n == 2
    assert df.row(0, ["x"]) == ("alpha",)


def test_alternate_delimiter(tmp_path):
    df = Dataframe.from_csv(_write(tmp_path, "a\tb\n1\t2\n"), delim="\t")
    assert df.row(0, ["a", "b"]) == ("1", "2")


def test_numeric_column(tmp_path):
    df = Dataframe.from_csv(_write(tmp_path, "v\n1.5\n-2\n0.25\n"))
    np.testing.assert_allclose(df.col("v").numeric(),
                               np.asarray([1.5, -2.0, 0.25], np.float32))


def test_huge_file_parallel_pass(tmp_path):
    # > 1 MiB triggers the multi-threaded first pass (nt > 1); verify the
    # chunk-boundary stitching with exact spot checks
    n = 150_000
    lines = "\n".join(f"{i},{i * 2}" for i in range(n))
    df = Dataframe.from_csv(_write(tmp_path, "a,b\n" + lines + "\n"))
    assert df.n == n
    for i in (0, 1, 12_345, 99_999, n - 1):
        assert df.row(i, ["a", "b"]) == (str(i), str(i * 2))


def test_batch_iteration(tmp_path):
    df = Dataframe.from_csv(
        _write(tmp_path, "v\n" + "\n".join(str(i) for i in range(10)) + "\n"))
    df.map("f", lambda s: np.float32(float(s)), ["v"])
    batches = list(df.iter(["f"], batch_size=4))
    assert len(batches) == 2  # drop_remainder (the reference's batching
    # add-on truncates to whole batches too, dataframe_addons.c)
    np.testing.assert_allclose(np.asarray(batches[0][0], np.float32).ravel(),
                               [0, 1, 2, 3])
    full = list(df.batch(["f"], batch_size=4, drop_remainder=False))
    assert len(full) == 3 and full[2][0].shape[0] == 2


def test_unicode_content(tmp_path):
    df = Dataframe.from_csv(_write(tmp_path,
                                   "a,b\nété,中文\n"))
    assert df.row(0, ["a", "b"]) == ("été", "中文")
