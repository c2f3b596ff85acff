"""Frame-sampler tests (reference tests/test_frame_sampler.py analog)."""

from office_person_detection_vit_tpu.video.frame_sampler import (
    AdaptiveSampler,
    CoarseSampler,
    FineSampler,
)


class TestCoarseSampler:
    def test_fixed_stride(self):
        s = CoarseSampler(interval_seconds=2.0, fps=30.0)
        assert s.stride == 60
        assert list(s.sample(200)) == [0, 60, 120, 180]

    def test_start_end_window(self):
        s = CoarseSampler(interval_seconds=1.0, fps=10.0)
        assert list(s.sample(1000, start=50, end=85)) == [50, 60, 70, 80]

    def test_end_clamped_to_frame_count(self):
        s = CoarseSampler(interval_seconds=1.0, fps=10.0)
        assert list(s.sample(25, end=100)) == [0, 10, 20]

    def test_minimum_stride_one(self):
        s = CoarseSampler(interval_seconds=0.001, fps=30.0)
        assert s.stride == 1


class TestFineSampler:
    def test_window_around_target(self):
        s = FineSampler(interval_seconds=0.1, window_seconds=0.5, fps=10.0)
        # stride 1, window 5 frames
        assert s.sample_around_target(100, 10_000) == list(range(95, 106))

    def test_clamped_at_video_start(self):
        s = FineSampler(interval_seconds=0.1, window_seconds=1.0, fps=10.0)
        assert s.sample_around_target(3, 10_000)[0] == 0

    def test_clamped_at_video_end(self):
        s = FineSampler(interval_seconds=0.1, window_seconds=1.0, fps=10.0)
        frames = s.sample_around_target(98, 100)
        assert frames[-1] <= 99

    def test_fine_stride(self):
        s = FineSampler(interval_seconds=0.2, window_seconds=0.4, fps=10.0)
        assert s.sample_around_target(50, 1000) == [46, 48, 50, 52, 54]


class TestAdaptiveSampler:
    def test_high_confidence_widens(self):
        s = AdaptiveSampler(base_interval_seconds=2.0, fps=30.0)
        assert s.adjust_interval(0.9) == 3.0
        assert s.stride == 90

    def test_low_confidence_tightens(self):
        s = AdaptiveSampler(base_interval_seconds=2.0, fps=30.0)
        assert s.adjust_interval(0.2) == 1.0

    def test_mid_confidence_unchanged(self):
        s = AdaptiveSampler(base_interval_seconds=2.0, fps=30.0)
        assert s.adjust_interval(0.6) == 2.0

    def test_clamps_to_bounds(self):
        s = AdaptiveSampler(2.0, fps=30.0, min_interval=1.0, max_interval=4.0)
        for _ in range(10):
            s.adjust_interval(0.99)
        assert s.interval == 4.0
        for _ in range(10):
            s.adjust_interval(0.01)
        assert s.interval == 1.0

    def test_stride_never_below_one(self):
        s = AdaptiveSampler(0.001, fps=10.0, min_interval=0.0001)
        s.adjust_interval(0.1)
        assert s.stride == 1
