"""NNC example-app twins: imdb / imdb_lstm / wmt demo modes learn."""

import os
import sys

import pytest

BIN = os.path.join(os.path.dirname(__file__), "..", "bin")
sys.path.insert(0, BIN)


def _run(module, argv):
    import importlib

    old = sys.argv
    sys.argv = [module] + argv
    try:
        mod = importlib.import_module(module)
        return mod.main()
    finally:
        sys.argv = old


def test_imdb_transformer_demo_learns():
    acc = _run("imdb", ["--demo", "--epochs", "2", "--batch", "32",
                        "--max-len", "32", "--layers", "1", "--dim", "32",
                        "--heads", "2"])
    assert acc >= 0.9, acc


def test_imdb_lstm_demo_learns():
    acc = _run("imdb_lstm", ["--demo", "--epochs", "2", "--batch", "32",
                             "--max-len", "32", "--dim", "32"])
    assert acc >= 0.9, acc


def test_wmt_demo_loss_drops():
    loss = _run("wmt", ["--demo", "--epochs", "10", "--batch", "32",
                        "--heads", "4", "--lr", "3e-3"])
    # synthetic copy task from random init: smoothed CE starts ~ln(64)=4.16;
    # the wmt.c post-LN-inside-residual topology trains slowly, so the gate
    # is a solid drop, not convergence
    assert loss < 3.5, loss


def test_iwslt_demo_loss_drops():
    """iwslt twin: Noam warmup + gradient accumulation + greedy decode
    all execute; loss drops on the copy task."""
    loss = _run("iwslt", ["--demo", "--epochs", "10", "--batch", "32",
                          "--heads", "4", "--big-step", "2"])
    # copy-task CE starts at ln(64)=4.16; half the run sits in the Noam
    # linear-warmup region, so the gate is a steady drop, not convergence
    assert loss < 3.9, loss
