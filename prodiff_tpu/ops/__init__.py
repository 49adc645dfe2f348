"""Jittable TPU compute ops (sequence regulation, STFT/mel, schedules, losses)."""
