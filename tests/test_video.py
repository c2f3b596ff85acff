from datetime import datetime, timedelta

import numpy as np
import pytest

from office_person_detection_vit_tpu.video.frame_sampler import (
    AdaptiveSampler,
    CoarseSampler,
    FineSampler,
)
from office_person_detection_vit_tpu.video.prefetch import PrefetchLoader
from office_person_detection_vit_tpu.video.video_processor import VideoProcessor
from tests.helpers.synthetic_video import write_video


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    return write_video(
        tmp_path_factory.mktemp("vid") / "test.mp4",
        num_frames=30, fps=30.0, width=640, height=360,
    )


def test_open_and_metadata(video_path):
    with VideoProcessor(video_path) as vp:
        assert vp.frame_count == 30
        assert vp.width == 640 and vp.height == 360
        assert abs(vp.fps - 30.0) < 0.1
        assert abs(vp.duration_seconds - 1.0) < 0.05


def test_random_access_seek(video_path):
    with VideoProcessor(video_path) as vp:
        f10 = vp.get_frame(10)
        f0 = vp.get_frame(0)
        assert f10.shape == (360, 640, 3)
        assert f0 is not None and not np.array_equal(f0, f10)
        assert vp.get_frame(999) is None
        assert vp.get_frame(-1) is None


def test_sequential_read(video_path):
    with VideoProcessor(video_path) as vp:
        count = 0
        while vp.read_next_frame() is not None:
            count += 1
        assert count == 30


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        VideoProcessor("/nonexistent.mp4").open()


def test_coarse_sampler():
    s = CoarseSampler(interval_seconds=2.0, fps=30.0)
    assert list(s.sample(300)) == list(range(0, 300, 60))


def test_fine_sampler():
    s = FineSampler(interval_seconds=1.0, window_seconds=2.0, fps=30.0)
    frames = s.sample_around_target(100, 1000)
    assert frames[0] == 40 and frames[-1] <= 160
    assert all(b - a == 30 for a, b in zip(frames, frames[1:]))


def test_adaptive_sampler():
    s = AdaptiveSampler(base_interval_seconds=5.0, fps=30.0)
    s.adjust_interval(0.9)
    assert s.interval == 7.5
    s.adjust_interval(0.1)
    assert s.interval == 3.75


def test_prefetch_loader_batches(video_path):
    with VideoProcessor(video_path) as vp:
        loader = PrefetchLoader(
            frame_numbers=list(range(0, 30, 3)),
            fetch_fn=vp.get_frame,
            batch_size=4,
        )
        batches = list(loader)
    nums = [n for ns, _ in batches for n in ns]
    assert nums == list(range(0, 30, 3))
    assert batches[0][1].shape == (4, 360, 640, 3)
    assert batches[-1][1].shape[0] == 2  # 10 frames -> 4+4+2


def test_prefetch_loader_skips_bad_frames():
    def fetch(fn):
        return None if fn == 5 else np.zeros((8, 8, 3), np.uint8)

    loader = PrefetchLoader([4, 5, 6], fetch, batch_size=2)
    nums = [n for ns, _ in loader for n in ns]
    assert nums == [4, 6]


class TestStridedIteration:
    def test_iter_frames_matches_random_access(self, tmp_path):
        from tests.helpers.synthetic_video import write_video
        from office_person_detection_vit_tpu.video.video_processor import VideoProcessor

        path = write_video(tmp_path / "v.mp4", num_frames=30)
        vp = VideoProcessor(path)
        vp.open()
        wanted = [0, 7, 14, 28]
        seq = dict(vp.iter_frames(wanted))
        assert sorted(seq) == wanted
        for fn in wanted:
            direct = vp.get_frame(fn)
            assert np.array_equal(seq[fn], direct)
        vp.release()

    def test_iter_frames_rejects_descending(self, tmp_path):
        from tests.helpers.synthetic_video import write_video
        from office_person_detection_vit_tpu.video.video_processor import VideoProcessor

        path = write_video(tmp_path / "v2.mp4", num_frames=10)
        vp = VideoProcessor(path)
        vp.open()
        import pytest as _pytest

        with _pytest.raises(ValueError):
            list(vp.iter_frames([5, 2]))
        vp.release()

    def test_prefetch_with_iter_fn(self, tmp_path):
        from tests.helpers.synthetic_video import write_video
        from office_person_detection_vit_tpu.video.prefetch import PrefetchLoader
        from office_person_detection_vit_tpu.video.video_processor import VideoProcessor

        path = write_video(tmp_path / "v3.mp4", num_frames=20)
        vp = VideoProcessor(path)
        vp.open()
        loader = PrefetchLoader(
            list(range(0, 20, 4)), iter_fn=vp.iter_frames, batch_size=3
        )
        got = []
        for numbers, stack in loader:
            assert stack.shape[0] == len(numbers)
            got.extend(numbers)
        assert got == [0, 4, 8, 12, 16]
        vp.release()
