"""SMILES randomization (data augmentation).

The reference's randomize_smiles (Utils/smiles.py:494, used by
SmilesDataset with probability randomize_prob, Utils/dataset.py:251-289)
re-roots the canonical DFS at a random atom via RDKit's renumbering.
Here we reuse our writer with a random rank permutation.
"""

from __future__ import annotations

import random
from typing import Optional

from gctplus_tpu.chem.canonical import write_smiles
from gctplus_tpu.chem.sanitize import mol_from_smiles


def randomize_smiles(smiles: str, rng: Optional[random.Random] = None
                     ) -> Optional[str]:
    mol = mol_from_smiles(smiles)
    if mol is None:
        return None
    rng = rng or random
    n = mol.num_atoms()
    perm = list(range(n))
    rng.shuffle(perm)
    return write_smiles(mol, ranks=perm)
