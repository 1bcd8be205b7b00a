"""Multi-host runtime seam: ctl partitioning + single-host fallback.

Reference: SphinxTrain bw -part/-npart (bw/main.c:492-497,
corpus_set_partition), Queue/POSIX.pm single-box validation (SURVEY.md §4).
"""

import pytest

from cmusphinx_tpu.parallel import (HostInfo, init_distributed,
                                    partition_ctl)


def test_partition_covers_everything_in_order():
    items = list(range(17))
    for npart in (1, 2, 3, 5, 17):
        parts = [partition_ctl(items, p, npart)
                 for p in range(1, npart + 1)]
        flat = [x for part in parts for x in part]
        assert flat == items
        # contiguous blocks; remainder spread over the FIRST parts
        sizes = [len(p) for p in parts]
        assert max(sizes) - min(sizes) <= 1
        assert sizes == sorted(sizes, reverse=True)


def test_partition_bounds():
    with pytest.raises(ValueError):
        partition_ctl([1, 2, 3], 0, 2)
    with pytest.raises(ValueError):
        partition_ctl([1, 2, 3], 3, 2)


def test_partition_more_parts_than_items():
    parts = [partition_ctl([1, 2], p, 4) for p in range(1, 5)]
    assert parts == [[1], [2], [], []]


def test_single_host_fallback_is_noop():
    info = init_distributed()
    assert info == HostInfo(process_id=0, num_processes=1,
                            initialized=False)
    assert info.is_primary


def test_local_partition_with_info():
    from cmusphinx_tpu.parallel.hosts import local_partition
    items = list(range(10))
    a = local_partition(items, HostInfo(0, 2, True))
    b = local_partition(items, HostInfo(1, 2, True))
    assert a + b == items
