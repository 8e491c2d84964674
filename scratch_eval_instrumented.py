import time, sys
t0=time.time()
def tick(msg): print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)
sys.argv = ['evaluate.py','-qa_file','qa_pairs.npy','-dataset_config','/tmp/crct_e2e/ds.json',
  '-eval_set','test','-num_workers','2','-save_name','cli_real_eval','-eval_batch_size','64',
  '-start_checkpoint','/tmp/crct_e2e/results/cli_real/plotqa_encoder_0_8.ckpt']
tick("importing")
from crct_tpu.config import read_command_line
from crct_tpu.data.dataset import ChartQADataset, DataLoader
from crct_tpu.cli.evaluate import load_eval_model
from crct_tpu.train.eval_loop import evaluate, _flatten_valid_rows, _chunk_rows, print_acc_table
params = read_command_line()
tick("params read")
ds = ChartQADataset(params, params['eval_set'], init_split=params['eval_set'])
ds.get_all_answers = True
tick("dataset loaded")
loader = DataLoader(ds, batch_size=64, shuffle=False, drop_last=False, num_workers=2)
sample = next(iter(DataLoader(ds, batch_size=1, shuffle=False, num_workers=1, drop_last=False)))
tick("sample built")
rows, _ = _flatten_valid_rows(sample)
chunked, _ = next(_chunk_rows(rows, 64))
model, model_params = load_eval_model(params, chunked)
tick("model loaded")
total, breakdown, hist = evaluate(loader, ds, params, model, model_params, csv=True)
tick("evaluated")
print_acc_table(print, total)
