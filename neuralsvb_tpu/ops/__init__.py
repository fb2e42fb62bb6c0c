"""Numeric/DSP kernels (layer L1): STFT+mel frontend, pitch utilities,
SSIM, CWT, DTW. All device code is JAX/XLA (with Pallas where it pays);
numpy twins exist for the offline CPU binarize path."""
