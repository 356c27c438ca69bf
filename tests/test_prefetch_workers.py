"""Multi-producer Prefetcher: list-of-iterables fan-out (data/pipeline.py).

Used when host sampling is the bottleneck (PinSage at b512+): N iid sampler
iterators feed one queue from N threads; order across producers is
unspecified but nothing is lost or duplicated, END arrives after all
producers finish, and a producer error still fails the consumer loudly.
"""
import pytest

from recommender_tpu.data.pipeline import prefetch_to_device


def test_interleave_completeness():
    its = [iter([(w, i) for i in range(20)]) for w in range(3)]
    pf = prefetch_to_device(workers=its, size=4)
    got = list(pf)
    assert len(got) == 60
    assert sorted(got) == sorted((w, i) for w in range(3) for i in range(20))


def test_per_worker_order_preserved():
    its = [iter([(w, i) for i in range(50)]) for w in range(2)]
    got = list(prefetch_to_device(workers=its, size=2))
    for w in range(2):
        seq = [i for ww, i in got if ww == w]
        assert seq == list(range(50))


def test_producer_error_propagates():
    def bad():
        yield 1
        raise ValueError("boom")

    pf = prefetch_to_device(workers=[bad(), iter(range(1000))], size=2)
    with pytest.raises(RuntimeError, match="prefetch producer failed"):
        for _ in pf:
            pass


def test_single_iterable_unchanged():
    assert list(prefetch_to_device(iter(range(10)), size=2)) == list(range(10))


def test_plain_list_is_one_iterable_of_items():
    # A list of dict batches passed as `it` must yield the dicts themselves
    # (fan-out is opt-in via workers=, never inferred from container type).
    batches = [{"a": 1}, {"a": 2}]
    assert list(prefetch_to_device(batches, size=2)) == batches


def test_it_and_workers_are_exclusive():
    with pytest.raises(ValueError, match="not both"):
        prefetch_to_device(iter([1]), workers=[iter([2])])


def test_put_fn_applied_in_workers():
    its = [iter(range(5)), iter(range(5))]
    got = list(prefetch_to_device(workers=its, size=2, put_fn=lambda x: x * 10))
    assert sorted(got) == sorted([x * 10 for x in range(5)] * 2)


def test_close_unblocks_producers():
    def endless(w):
        i = 0
        while True:
            yield (w, i)
            i += 1

    pf = prefetch_to_device(workers=[endless(0), endless(1)], size=2)
    assert next(pf) is not None
    pf.close()  # must not hang
