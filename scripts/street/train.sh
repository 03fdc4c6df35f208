# street 512 (reference scripts/street/train_g8.sh: bs 46)
python train.py --name street --dataset_mode fewshot_street \
  --adaptive_spade --loadSize 512 --fineSize 512 --batchSize 46 --continue_train "$@"
