"""Pretrained checkpoint path registry.

Mirror of reference modules/psp/__init__.py:1-10 (model_paths): the
conventional on-disk locations of the pretrained .pth assets consumed by
tools/convert_torch.py. None of these download automatically — this
environment has no network egress; place the files and point the CLI flags
(or these defaults) at them.
"""

model_paths = {
    "stylegan_ffhq": "pretrained_models/stylegan2-ffhq-config-f.pt",
    "ir_se50": "pretrained_models/model_ir_se50.pth",
    "shape_predictor": "pretrained_models/shape_predictor_68_face_landmarks.dat",
    "circular_face": "pretrained_models/psp_ffhq_encode.pt",
    "vgg16": "pretrained_models/vgg16-397923af.pth",
    "alexnet": "pretrained_models/alexnet-owt-7be5be79.pth",
    "lpips_lin_alex": "pretrained_models/lpips_alex_v0.1.pth",
    "inception_v3": "pretrained_models/inception_v3_google-0cc3c7bd.pth",
}
