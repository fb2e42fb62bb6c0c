"""FastSpeech2 + multi-window mel GAN (reference: tasks/tts/fs2_adv.py:11-128).
The adversarial machinery lives in AdversarialTaskBase; this class only turns
the discriminator on (mel_gan)."""

from .fs2 import FastSpeech2Task


class FastSpeech2AdvTask(FastSpeech2Task):
    pass  # mel_gan/disc config comes from hparams (egs/egs_bases/tts/fs2_adv.yaml)
