"""Arrow-vectorized hashed-bigram gate scorer (r13, guide §4.2/§4.5).

This module deliberately has NO ``from __future__ import annotations``:
pandas_udf infers the iterator signature from the evaluated type hints,
and stringified hints referencing function-local imports do not resolve.

See operators/corpus.py::_hashclf_sw for the frozen feature definition
and the bit-identity argument; this module only hosts the batch loop.
"""

from typing import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_sw_udf(wints: list, p: int, b: int):
    """bigint pandas_udf: array<string> words → SW = Σ wints[feature(bigram)].

    Iterator form: the weight table binds once per task; the
    bigram→weight memo (a pure function of the bigram string — never
    data) amortizes repeated bigrams across every batch in the partition.
    """

    @pandas_udf("bigint")
    def _sw(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from hashlib import md5

        w = wints
        memo: dict = {}
        for ws_batch in batches:
            out = []
            for ws in ws_batch:
                s = 0
                prev = None
                for word in ws:
                    if prev is not None:
                        bg = prev + " " + word
                        v = memo.get(bg)
                        if v is None:
                            v = w[
                                int(
                                    md5(b"ftq:" + bg.encode()).hexdigest()[:8],
                                    16,
                                )
                                % p
                                % b
                            ]
                            memo[bg] = v
                        s += v
                    prev = word
                out.append(s)
            if len(memo) > 2_000_000:  # bound worker memory on huge vocabularies
                memo.clear()
            yield pd.Series(out, dtype="int64")

    return _sw
