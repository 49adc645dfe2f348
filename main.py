"""CLI — same command surface as the reference (``main.py:1-143``):
binarize / train / infer / vocode wav2wav / preprocess / web / merge_rectified.
"""

import click

from prodiff_tpu.config import set_hparams


@click.group()
def main():
    # relay compiles cost minutes; cache across runs. Deferred into the group
    # callback (not module scope) so a broken cache dir can't kill the CLI and
    # importing main never initialises a jax backend.
    try:
        from prodiff_tpu.utils.jax_cache import enable_persistent_cache

        enable_persistent_cache()
    except Exception:
        pass


@main.command()
@click.argument("task", type=str)
@click.option("--config", type=str, required=True)
@click.option("--exp_name", type=str, required=True)
def binarize(task, config, exp_name):
    from prodiff_tpu.binarize import BinarizeHandler

    hparams = set_hparams(config_fn=config, exp_name=exp_name, task=task, make_work_dir=False)
    BinarizeHandler(hparams=hparams).handle()


@main.command()
@click.argument("train_task", type=str)
@click.option("--config", type=str, required=True)
@click.option("--exp_name", type=str, required=True)
@click.option("--max_steps", type=int, default=None, help="override max_updates")
def train(train_task, config, exp_name, max_steps):
    from prodiff_tpu.tasks import get_task_cls
    from prodiff_tpu.training.trainer import Trainer

    hparams = set_hparams(config_fn=config, exp_name=exp_name, task=train_task, make_work_dir=True)
    task = get_task_cls(train_task)(hparams)
    Trainer(hparams).fit(task, max_steps=max_steps)


@main.command()
@click.argument("proj", type=str)
@click.option("--exp_name", type=str, required=True)
@click.option("--spk_name", type=str, required=True)
@click.option("--lang", type=str, default="zh")
@click.option("--keyshift", type=int, default=0)
@click.option("--gender", type=float, default=0)
@click.option("--pred_dur", is_flag=True)
@click.option("--pred_pitch", type=str, default="")
@click.option("--pred_voicing", is_flag=True)
@click.option("--pred_breath", is_flag=True)
@click.option("--isolate_aspiration", is_flag=True)
@click.option("--isolate_base_harmonic", is_flag=True)
def infer(proj, exp_name, spk_name, lang, keyshift, gender,
          pred_dur, pred_pitch, pred_voicing, pred_breath,
          isolate_aspiration, isolate_base_harmonic):
    from prodiff_tpu.infer.handler import SVSInferHandler

    SVSInferHandler(
        exp_name=exp_name,
        pred_dur=pred_dur,
        pred_pitch=pred_pitch,
        pred_voicing=pred_voicing,
        pred_breath=pred_breath,
        isolate_aspiration=isolate_aspiration,
        isolate_base_harmonic=isolate_base_harmonic,
    ).handle(None, proj, spk_name, lang, keyshift, gender)


@main.group()
def vocode():
    pass


@vocode.command()
@click.argument("wav", type=str)
@click.option("--config", type=str, required=True)
@click.option("--keyshift", type=int, default=0)
@click.option("--output_dir", type=str, default="infer_out")
def wav2wav(wav, config, keyshift, output_dir):
    """Copy-synthesis / key-shifted voice conversion through the vocoder."""
    import os

    import numpy as np

    from prodiff_tpu.pe import get_pe_cls
    from prodiff_tpu.utils.audio import save_wav
    from prodiff_tpu.utils.pitch_utils import shift_pitch
    from prodiff_tpu.vocoders import get_vocoder_cls

    hparams = set_hparams(config_fn=config, task="vocoder", make_work_dir=False)
    vocoder = get_vocoder_cls(hparams["vocoder"])(hparams)
    pe = get_pe_cls(hparams.get("pitch_extractor", "parselmouth"))(hparams)
    os.makedirs(output_dir, exist_ok=True)
    if os.path.isdir(wav):
        wav_files = [os.path.join(wav, f) for f in os.listdir(wav) if f.endswith(".wav")]
    else:
        wav_files = [wav]
    for wav_file in wav_files:
        wave, mel = vocoder.wav2spec(wav_file, hparams=hparams, keyshift=keyshift)
        f0, _ = pe.get_pitch(
            wave, hparams["audio_sample_rate"], len(mel),
            hop_size=hparams["hop_size"],
            interp_uv=hparams.get("interp_uv", True),
        )
        if keyshift != 0:
            f0 = shift_pitch(f0, keyshift)
        res = vocoder.spec2wav(mel, f0=np.asarray(f0, np.float32))
        title = os.path.basename(wav_file).split(".")[0]
        save_wav(res, os.path.join(output_dir, f"{title}.wav"), hparams["audio_sample_rate"])


@main.command()
@click.argument("data_dir", type=str, required=True)
@click.option("--lang", type=str, default="zh")
@click.option("--override_ph_num", is_flag=True)
@click.option("--override_note_midi", is_flag=True)
@click.option("--extract_note", is_flag=True)
@click.option("--override_ori_label", is_flag=True)
def preprocess(data_dir, lang, override_ph_num, override_note_midi,
               override_ori_label, extract_note):
    from prodiff_tpu.preprocess import PreprocessHandler

    PreprocessHandler(data_dir=data_dir, lang=lang).handle(
        extract_note=extract_note,
        override_ph_num=override_ph_num,
        override_note_midi=override_note_midi,
        override_ori_label=override_ori_label,
    )


@main.command()
@click.option("--exp_name", type=str, required=True)
@click.option("--port", type=int, default=7694)
def web(exp_name, port):
    from prodiff_tpu.serve.handler import WebHandler

    WebHandler(exp_name=exp_name, port=port).handle()


@main.command(name="convert_ckpt")
@click.argument("torch_ckpt", type=str)
@click.option("--config", type=str, required=True, help="hparams yaml describing the model")
@click.option("--out", type=str, default=None, help="output path (default: alongside input)")
@click.option("--step", type=int, default=0, help="global step to stamp")
def convert_ckpt(torch_ckpt, config, out, step):
    """Convert a reference (torch) ProDiffTeacher checkpoint into this
    framework's format, so released SVS models load directly."""
    import os

    from flax import serialization

    from prodiff_tpu.utils.teacher_convert import load_reference_teacher_ckpt

    hparams = set_hparams(config_fn=config, task="svs", make_work_dir=False)
    variables = load_reference_teacher_ckpt(torch_ckpt, hparams)
    payload = {
        "global_step": step,
        "epoch": 0,
        "checkpoint_callback_best": 0.0,
        "state_dict": variables,
        "optimizer_state": {},
    }
    out = out or os.path.join(
        os.path.dirname(torch_ckpt), f"model_ckpt_steps_{step}.ckpt"
    )
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    print(f"| converted -> {out}")


@main.command(name="merge_rectified")
@click.argument("target_ckpt", type=str)
@click.argument("component_ckpt", type=str)
def merge_rectified(target_ckpt, component_ckpt):
    """Splice a distilled student diffusion into a full teacher checkpoint
    (reference ``main.py:128-140``)."""
    from prodiff_tpu.utils import ckpt_utils

    target = ckpt_utils.load_checkpoint_file(target_ckpt)
    component = ckpt_utils.load_checkpoint_file(component_ckpt)
    target["state_dict"]["params"]["diffusion"] = component["state_dict"]["params"]
    import os

    from flax import serialization

    out = target_ckpt + ".merged.ckpt"
    with open(out, "wb") as f:
        f.write(serialization.msgpack_serialize(target))
    print(f"| merged -> {out}")


if __name__ == "__main__":
    main()
