"""torch checkpoint -> flax params converters for the released reference
artifacts (1009_pretrain_asr_english, 1012_hifigan_all_songs_nsf,
1030_vae_mle; reference README.md:47-97)."""
