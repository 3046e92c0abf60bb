"""Default hyperparameters — parity with /root/reference/config.py.

Unlike the reference, these defaults actually drive the code: CLI weights are
honored (the reference hard-coded over them, train.py:121-122 — defect #4) and
the layer config feeds the name-addressed VGG taps (the reference's
``vgg_loss_layers`` dict was imported everywhere and consulted nowhere —
SURVEY.md §5.6).
"""

training_config = {
    "TOTAL_STEPS": 80_000,
    "BATCH_SIZE": 20,
    "LEARNING_RATE": 1e-3,
    "NUM_EPOCHS": 4,  # accepted for flag parity; the loop is step-bounded
    "TRAIN_IMAGE_SHAPE": (256, 256),
}

# style and content weights change every 10k iterations (train/schedule.py)
loss_weights_config = {
    "CONTENT_WEIGHT": 1000.0,
    "STYLE_WEIGHT": 1.0,
    "TV_WEIGHT": 10.0,
}

vgg_loss_layers = {
    "CONTENT_LAYER": "relu4_2",
    # The reference config listed 4 style layers but its loss used only the
    # first 3 (zip truncation, defect #2). 3 layers + 3 weights, validated.
    "STYLE_LAYERS": ("relu1_2", "relu2_2", "relu3_3"),
    "STYLE_LAYER_WEIGHTS": (0.25, 0.3, 0.45),
}

style_image = "style.jpg"
training_monitor_content_image = "dancing.jpg"
dataset_dir = "data/train"
output_dir = "training_output"
inference_content_image = "dancing.jpg"
vgg19_weights = None  # or path to .npz / torchvision .pth (models/vgg_weights.py)
