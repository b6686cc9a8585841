#!/usr/bin/env python
"""Build the round-5 10x-unique-content Shakespeare corpus (phase X).

The hermetic fallback corpus (tinydiffusionmodels_tpu/data/shakespeare.py)
tiles ~3 KB of unique public-domain passages to 1 MB. The round-4 frontier
(docs/docs/assets/ladder_r4.jsonl) concluded the ppl-vs-novelty pareto is
dictated by that unique-content budget, not by model capacity or sampling.
This script tests the hypothesis: same 1 MB corpus size (same steps/epoch,
same training budget), ~10x the UNIQUE text.

All embedded passages are public-domain Shakespeare (pre-1700), written out
from memory. Exact textual fidelity to any particular edition is NOT
required for the data-scaling experiment — what matters is that the text is
stylistically homogeneous early-modern English, in-domain with the base
passages, and genuinely non-repeating. The base fallback passages are
included as a subset so the char vocabulary is a superset of the round-4
runs.

Usage: python tools/make_corpus_10x.py --out runs/tiny_shakespeare_10x.txt
"""

from __future__ import annotations

import argparse
import sys
import zlib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tinydiffusionmodels_tpu.data.shakespeare import _FALLBACK_PASSAGES

# ~30 KB of additional unique public-domain Shakespeare (sonnets and
# well-known speeches), ASCII-normalized to match the base corpus charset.
_EXTRA_PASSAGES = [
    # --- Sonnets ---
    """Shall I compare thee to a summer's day?
Thou art more lovely and more temperate:
Rough winds do shake the darling buds of May,
And summer's lease hath all too short a date:
Sometime too hot the eye of heaven shines,
And often is his gold complexion dimm'd;
And every fair from fair sometime declines,
By chance or nature's changing course untrimm'd;
But thy eternal summer shall not fade
Nor lose possession of that fair thou owest;
Nor shall Death brag thou wander'st in his shade,
When in eternal lines to time thou growest:
So long as men can breathe or eyes can see,
So long lives this and this gives life to thee.""",
    """When, in disgrace with fortune and men's eyes,
I all alone beweep my outcast state
And trouble deaf heaven with my bootless cries
And look upon myself and curse my fate,
Wishing me like to one more rich in hope,
Featured like him, like him with friends possess'd,
Desiring this man's art and that man's scope,
With what I most enjoy contented least;
Yet in these thoughts myself almost despising,
Haply I think on thee, and then my state,
Like to the lark at break of day arising
From sullen earth, sings hymns at heaven's gate;
For thy sweet love remember'd such wealth brings
That then I scorn to change my state with kings.""",
    """When to the sessions of sweet silent thought
I summon up remembrance of things past,
I sigh the lack of many a thing I sought,
And with old woes new wail my dear time's waste:
Then can I drown an eye, unused to flow,
For precious friends hid in death's dateless night,
And weep afresh love's long since cancell'd woe,
And moan the expense of many a vanish'd sight:
Then can I grieve at grievances foregone,
And heavily from woe to woe tell o'er
The sad account of fore-bemoaned moan,
Which I new pay as if not paid before.
But if the while I think on thee, dear friend,
All losses are restored and sorrows end.""",
    """Not marble, nor the gilded monuments
Of princes, shall outlive this powerful rhyme;
But you shall shine more bright in these contents
Than unswept stone besmear'd with sluttish time.
When wasteful war shall statues overturn,
And broils root out the work of masonry,
Nor Mars his sword nor war's quick fire shall burn
The living record of your memory.
'Gainst death and all-oblivious enmity
Shall you pace forth; your praise shall still find room
Even in the eyes of all posterity
That wear this world out to the ending doom.
So, till the judgment that yourself arise,
You live in this, and dwell in lovers' eyes.""",
    """Like as the waves make towards the pebbled shore,
So do our minutes hasten to their end;
Each changing place with that which goes before,
In sequent toil all forwards do contend.
Nativity, once in the main of light,
Crawls to maturity, wherewith being crown'd,
Crooked eclipses 'gainst his glory fight,
And Time that gave doth now his gift confound.
Time doth transfix the flourish set on youth
And delves the parallels in beauty's brow,
Feeds on the rarities of nature's truth,
And nothing stands but for his scythe to mow:
And yet to times in hope my verse shall stand,
Praising thy worth, despite his cruel hand.""",
    """Since brass, nor stone, nor earth, nor boundless sea,
But sad mortality o'er-sways their power,
How with this rage shall beauty hold a plea,
Whose action is no stronger than a flower?
O, how shall summer's honey breath hold out
Against the wreckful siege of battering days,
When rocks impregnable are not so stout,
Nor gates of steel so strong, but Time decays?
O fearful meditation! where, alack,
Shall Time's best jewel from Time's chest lie hid?
Or what strong hand can hold his swift foot back?
Or who his spoil of beauty can forbid?
O, none, unless this miracle have might,
That in black ink my love may still shine bright.""",
    """That time of year thou mayst in me behold
When yellow leaves, or none, or few, do hang
Upon those boughs which shake against the cold,
Bare ruin'd choirs, where late the sweet birds sang.
In me thou seest the twilight of such day
As after sunset fadeth in the west,
Which by and by black night doth take away,
Death's second self, that seals up all in rest.
In me thou see'st the glowing of such fire
That on the ashes of his youth doth lie,
As the death-bed whereon it must expire
Consumed with that which it was nourish'd by.
This thou perceivest, which makes thy love more strong,
To love that well which thou must leave ere long.""",
    """When in the chronicle of wasted time
I see descriptions of the fairest wights,
And beauty making beautiful old rhyme
In praise of ladies dead and lovely knights,
Then, in the blazon of sweet beauty's best,
Of hand, of foot, of lip, of eye, of brow,
I see their antique pen would have express'd
Even such a beauty as you master now.
So all their praises are but prophecies
Of this our time, all you prefiguring;
And, for they look'd but with divining eyes,
They had not skill enough your worth to sing:
For we, which now behold these present days,
Have eyes to wonder, but lack tongues to praise.""",
    """Let me not to the marriage of true minds
Admit impediments. Love is not love
Which alters when it alteration finds,
Or bends with the remover to remove:
O no! it is an ever-fixed mark
That looks on tempests and is never shaken;
It is the star to every wandering bark,
Whose worth's unknown, although his height be taken.
Love's not Time's fool, though rosy lips and cheeks
Within his bending sickle's compass come:
Love alters not with his brief hours and weeks,
But bears it out even to the edge of doom.
If this be error and upon me proved,
I never writ, nor no man ever loved.""",
    """My mistress' eyes are nothing like the sun;
Coral is far more red than her lips' red;
If snow be white, why then her breasts are dun;
If hairs be wires, black wires grow on her head.
I have seen roses damask'd, red and white,
But no such roses see I in her cheeks;
And in some perfumes is there more delight
Than in the breath that from my mistress reeks.
I love to hear her speak, yet well I know
That music hath a far more pleasing sound;
I grant I never saw a goddess go;
My mistress, when she walks, treads on the ground:
And yet, by heaven, I think my love as rare
As any she belied with false compare.""",
    """Th' expense of spirit in a waste of shame
Is lust in action; and till action, lust
Is perjured, murderous, bloody, full of blame,
Savage, extreme, rude, cruel, not to trust,
Enjoy'd no sooner but despised straight,
Past reason hunted, and no sooner had
Past reason hated, as a swallow'd bait
On purpose laid to make the taker mad;
Mad in pursuit and in possession so;
Had, having, and in quest to have, extreme;
A bliss in proof, and proved, a very woe;
Before, a joy proposed; behind, a dream.
All this the world well knows; yet none knows well
To shun the heaven that leads men to this hell.""",
    """Poor soul, the centre of my sinful earth,
Press'd by these rebel powers that thee array,
Why dost thou pine within and suffer dearth,
Painting thy outward walls so costly gay?
Why so large cost, having so short a lease,
Dost thou upon thy fading mansion spend?
Shall worms, inheritors of this excess,
Eat up thy charge? is this thy body's end?
Then soul, live thou upon thy servant's loss,
And let that pine to aggravate thy store;
Buy terms divine in selling hours of dross;
Within be fed, without be rich no more:
So shalt thou feed on Death, that feeds on men,
And Death once dead, there's no more dying then.""",
    # --- Speeches and soliloquies ---
    """Is this a dagger which I see before me,
The handle toward my hand? Come, let me clutch thee.
I have thee not, and yet I see thee still.
Art thou not, fatal vision, sensible
To feeling as to sight? or art thou but
A dagger of the mind, a false creation,
Proceeding from the heat-oppressed brain?
I see thee yet, in form as palpable
As this which now I draw.
Thou marshall'st me the way that I was going;
And such an instrument I was to use.
Mine eyes are made the fools o' the other senses,
Or else worth all the rest; I see thee still,
And on thy blade and dudgeon gouts of blood,
Which was not so before. There's no such thing:
It is the bloody business which informs
Thus to mine eyes.""",
    """If it were done when 'tis done, then 'twere well
It were done quickly: if the assassination
Could trammel up the consequence, and catch
With his surcease success; that but this blow
Might be the be-all and the end-all here,
But here, upon this bank and shoal of time,
We'ld jump the life to come. But in these cases
We still have judgment here; that we but teach
Bloody instructions, which, being taught, return
To plague the inventor: this even-handed justice
Commends the ingredients of our poison'd chalice
To our own lips. He's here in double trust;
First, as I am his kinsman and his subject,
Strong both against the deed; then, as his host,
Who should against his murderer shut the door,
Not bear the knife myself.""",
    """She should have died hereafter;
There would have been a time for such a word.
And all our yesterdays have lighted fools
The way to dusty death. I have lived long enough:
My way of life is fall'n into the sear,
The yellow leaf; and that which should accompany old age,
As honour, love, obedience, troops of friends,
I must not look to have; but, in their stead,
Curses, not loud but deep, mouth-honour, breath,
Which the poor heart would fain deny, and dare not.""",
    """O, what a rogue and peasant slave am I!
Is it not monstrous that this player here,
But in a fiction, in a dream of passion,
Could force his soul so to his own conceit
That from her working all his visage wann'd,
Tears in his eyes, distraction in's aspect,
A broken voice, and his whole function suiting
With forms to his conceit? and all for nothing!
For Hecuba!
What's Hecuba to him, or he to Hecuba,
That he should weep for her? What would he do,
Had he the motive and the cue for passion
That I have? He would drown the stage with tears
And cleave the general ear with horrid speech,
Make mad the guilty and appal the free,
Confound the ignorant, and amaze indeed
The very faculties of eyes and ears.""",
    """Speak the speech, I pray you, as I pronounced it to you,
trippingly on the tongue: but if you mouth it, as many of
your players do, I had as lief the town-crier spoke my lines.
Nor do not saw the air too much with your hand, thus, but use
all gently; for in the very torrent, tempest, and, as I may
say, the whirlwind of passion, you must acquire and beget a
temperance that may give it smoothness. O, it offends me to
the soul to hear a robustious periwig-pated fellow tear a
passion to tatters, to very rags, to split the ears of the
groundlings, who for the most part are capable of nothing but
inexplicable dumb-shows and noise.""",
    """What a piece of work is a man! how noble in reason!
how infinite in faculty! in form and moving how express and
admirable! in action how like an angel! in apprehension how
like a god! the beauty of the world! the paragon of animals!
And yet, to me, what is this quintessence of dust? man
delights not me: no, nor woman neither, though by your
smiling you seem to say so.""",
    """Alas, poor Yorick! I knew him, Horatio: a fellow of
infinite jest, of most excellent fancy: he hath borne me on
his back a thousand times; and now, how abhorred in my
imagination it is! my gorge rises at it. Here hung those lips
that I have kissed I know not how oft. Where be your gibes
now? your gambols? your songs? your flashes of merriment,
that were wont to set the table on a roar? Not one now, to
mock your own grinning? quite chap-fallen? Now get you to my
lady's chamber, and tell her, let her paint an inch thick, to
this favour she must come; make her laugh at that.""",
    """O, my offence is rank, it smells to heaven;
It hath the primal eldest curse upon't,
A brother's murder. Pray can I not,
Though inclination be as sharp as will:
My stronger guilt defeats my strong intent;
And, like a man to double business bound,
I stand in pause where I shall first begin,
And both neglect. What if this cursed hand
Were thicker than itself with brother's blood,
Is there not rain enough in the sweet heavens
To wash it white as snow? Whereto serves mercy
But to confront the visage of offence?""",
    """Blow, winds, and crack your cheeks! rage! blow!
You cataracts and hurricanoes, spout
Till you have drench'd our steeples, drown'd the cocks!
You sulphurous and thought-executing fires,
Vaunt-couriers to oak-cleaving thunderbolts,
Singe my white head! And thou, all-shaking thunder,
Smite flat the thick rotundity o' the world!
Crack nature's moulds, all germens spill at once,
That make ingrateful man!
I tax not you, you elements, with unkindness;
I never gave you kingdom, call'd you children,
You owe me no subscription: then let fall
Your horrible pleasure; here I stand, your slave,
A poor, infirm, weak, and despised old man.""",
    """How sharper than a serpent's tooth it is
To have a thankless child! Hear, nature, hear;
Dear goddess, hear! Suspend thy purpose, if
Thou didst intend to make this creature fruitful!
Into her womb convey sterility!
Dry up in her the organs of increase;
And from her derogate body never spring
A babe to honour her!""",
    """It is the cause, it is the cause, my soul,
Let me not name it to you, you chaste stars!
It is the cause. Yet I'll not shed her blood;
Nor scar that whiter skin of hers than snow,
And smooth as monumental alabaster.
Yet she must die, else she'll betray more men.
Put out the light, and then put out the light:
If I quench thee, thou flaming minister,
I can again thy former light restore,
Should I repent me: but once put out thy light,
Thou cunning'st pattern of excelling nature,
I know not where is that Promethean heat
That can thy light relume. When I have pluck'd the rose,
I cannot give it vital growth again.
It must needs wither: I'll smell it on the tree.""",
    """This royal throne of kings, this scepter'd isle,
This earth of majesty, this seat of Mars,
This other Eden, demi-paradise,
This fortress built by Nature for herself
Against infection and the hand of war,
This happy breed of men, this little world,
This precious stone set in the silver sea,
Which serves it in the office of a wall,
Or as a moat defensive to a house,
Against the envy of less happier lands,
This blessed plot, this earth, this realm, this England,
This nurse, this teeming womb of royal kings,
Fear'd by their breed and famous by their birth,
Renowned for their deeds as far from home,
For Christian service and true chivalry.""",
    """For God's sake, let us sit upon the ground
And tell sad stories of the death of kings;
How some have been deposed; some slain in war,
Some haunted by the ghosts they have deposed;
Some poison'd by their wives: some sleeping kill'd;
All murder'd: for within the hollow crown
That rounds the mortal temples of a king
Keeps Death his court and there the antic sits,
Scoffing his state and grinning at his pomp,
Allowing him a breath, a little scene,
To monarchize, be fear'd and kill with looks,
Infusing him with self and vain conceit,
As if this flesh which walls about our life
Were brass impregnable, and humour'd thus
Comes at the last and with a little pin
Bores through his castle wall, and farewell king!""",
    """This day is called the feast of Crispian:
He that outlives this day, and comes safe home,
Will stand a tip-toe when the day is named,
And rouse him at the name of Crispian.
He that shall live this day, and see old age,
Will yearly on the vigil feast his neighbours,
And say To-morrow is Saint Crispian:
Then will he strip his sleeve and show his scars.
And say These wounds I had on Crispin's day.
Old men forget: yet all shall be forgot,
But he'll remember with advantages
What feats he did that day: then shall our names,
Familiar in his mouth as household words,
Harry the king, Bedford and Exeter,
Warwick and Talbot, Salisbury and Gloucester,
Be in their flowing cups freshly remember'd.
We few, we happy few, we band of brothers;
For he to-day that sheds his blood with me
Shall be my brother.""",
    """How many thousand of my poorest subjects
Are at this hour asleep! O sleep, O gentle sleep,
Nature's soft nurse, how have I frighted thee,
That thou no more wilt weigh my eyelids down
And steep my senses in forgetfulness?
Why rather, sleep, liest thou in smoky cribs,
Upon uneasy pallets stretching thee
And hush'd with buzzing night-flies to thy slumber,
Than in the perfumed chambers of the great,
Under the canopies of costly state,
And lull'd with sound of sweetest melody?
Canst thou, O partial sleep, give thy repose
To the wet sea-boy in an hour so rude,
And in the calmest and most stillest night,
Deny it to a king? Then happy low, lie down!
Uneasy lies the head that wears a crown.""",
    """But Brutus says he was ambitious;
And Brutus is an honourable man.
He hath brought many captives home to Rome
Whose ransoms did the general coffers fill:
Did this in Caesar seem ambitious?
When that the poor have cried, Caesar hath wept:
Ambition should be made of sterner stuff:
Yet Brutus says he was ambitious;
And Brutus is an honourable man.
You all did see that on the Lupercal
I thrice presented him a kingly crown,
Which he did thrice refuse: was this ambition?
Yet Brutus says he was ambitious;
And, sure, he is an honourable man.
I speak not to disprove what Brutus spoke,
But here I am to speak what I do know.""",
    """Why, man, he doth bestride the narrow world
Like a Colossus, and we petty men
Walk under his huge legs and peep about
To find ourselves dishonourable graves.
Men at some time are masters of their fates:
The fault, dear Brutus, is not in our stars,
But in ourselves, that we are underlings.
Brutus and Caesar: what should be in that Caesar?
Why should that name be sounded more than yours?
Write them together, yours is as fair a name;
Sound them, it doth become the mouth as well;
Weigh them, it is as heavy; conjure with 'em,
Brutus will start a spirit as soon as Caesar.""",
    """There is a tide in the affairs of men
Which, taken at the flood, leads on to fortune;
Omitted, all the voyage of their life
Is bound in shallows and in miseries.
On such a full sea are we now afloat;
And we must take the current when it serves,
Or lose our ventures.""",
    """O, pardon me, thou bleeding piece of earth,
That I am meek and gentle with these butchers!
Thou art the ruins of the noblest man
That ever lived in the tide of times.
Woe to the hand that shed this costly blood!
Over thy wounds now do I prophesy,
Which, like dumb mouths, do ope their ruby lips,
To beg the voice and utterance of my tongue,
A curse shall light upon the limbs of men;
Domestic fury and fierce civil strife
Shall cumber all the parts of Italy.""",
    """Hath not a Jew eyes? hath not a Jew hands, organs,
dimensions, senses, affections, passions? fed with the same
food, hurt with the same weapons, subject to the same
diseases, healed by the same means, warmed and cooled by the
same winter and summer, as a Christian is? If you prick us,
do we not bleed? if you tickle us, do we not laugh? if you
poison us, do we not die? and if you wrong us, shall we not
revenge? If we are like you in the rest, we will resemble you
in that.""",
    """Our revels now are ended. These our actors,
As I foretold you, were all spirits and
Are melted into air, into thin air:
And, like the baseless fabric of this vision,
The cloud-capp'd towers, the gorgeous palaces,
The solemn temples, the great globe itself,
Yea, all which it inherit, shall dissolve
And, like this insubstantial pageant faded,
Leave not a rack behind. We are such stuff
As dreams are made on, and our little life
Is rounded with a sleep.""",
    """Full fathom five thy father lies;
Of his bones are coral made;
Those are pearls that were his eyes:
Nothing of him that doth fade
But doth suffer a sea-change
Into something rich and strange.
Sea-nymphs hourly ring his knell:
Hark! now I hear them, ding-dong, bell.""",
    """Ye elves of hills, brooks, standing lakes and groves,
And ye that on the sands with printless foot
Do chase the ebbing Neptune and do fly him
When he comes back; you demi-puppets that
By moonshine do the green sour ringlets make,
Whereof the ewe not bites, and you whose pastime
Is to make midnight mushrooms, that rejoice
To hear the solemn curfew; by whose aid,
Weak masters though ye be, I have bedimm'd
The noontide sun, call'd forth the mutinous winds,
And 'twixt the green sea and the azured vault
Set roaring war: to the dread rattling thunder
Have I given fire and rifted Jove's stout oak
With his own bolt.""",
    """And then the whining school-boy, with his satchel
And shining morning face, creeping like snail
Unwillingly to school. And then the lover,
Sighing like furnace, with a woeful ballad
Made to his mistress' eyebrow. Then a soldier,
Full of strange oaths and bearded like the pard,
Jealous in honour, sudden and quick in quarrel,
Seeking the bubble reputation
Even in the cannon's mouth. And then the justice,
In fair round belly with good capon lined,
With eyes severe and beard of formal cut,
Full of wise saws and modern instances;
And so he plays his part.""",
    """But, soft! what light through yonder window breaks?
It is the east, and Juliet is the sun.
Arise, fair sun, and kill the envious moon,
Who is already sick and pale with grief,
That thou her maid art far more fair than she:
Be not her maid, since she is envious;
Her vestal livery is but sick and green
And none but fools do wear it; cast it off.
It is my lady, O, it is my love!
O, that she knew she were!
She speaks yet she says nothing: what of that?
Her eye discourses; I will answer it.""",
    """O, then, I see Queen Mab hath been with you.
She is the fairies' midwife, and she comes
In shape no bigger than an agate-stone
On the fore-finger of an alderman,
Drawn with a team of little atomies
Athwart men's noses as they lie asleep;
Her wagon-spokes made of long spinners' legs,
The cover of the wings of grasshoppers,
The traces of the smallest spider's web,
The collars of the moonshine's watery beams,
Her whip of cricket's bone, the lash of film,
Her wagoner a small grey-coated gnat.""",
    """The lunatic, the lover and the poet
Are of imagination all compact:
One sees more devils than vast hell can hold,
That is, the madman: the lover, all as frantic,
Sees Helen's beauty in a brow of Egypt:
The poet's eye, in fine frenzy rolling,
Doth glance from heaven to earth, from earth to heaven;
And as imagination bodies forth
The forms of things unknown, the poet's pen
Turns them to shapes and gives to airy nothing
A local habitation and a name.""",
    """I know a bank where the wild thyme blows,
Where oxlips and the nodding violet grows,
Quite over-canopied with luscious woodbine,
With sweet musk-roses and with eglantine:
There sleeps Titania sometime of the night,
Lull'd in these flowers with dances and delight;
And there the snake throws her enamell'd skin,
Weed wide enough to wrap a fairy in.""",
    """The barge she sat in, like a burnish'd throne,
Burn'd on the water: the poop was beaten gold;
Purple the sails, and so perfumed that
The winds were love-sick with them; the oars were silver,
Which to the tune of flutes kept stroke, and made
The water which they beat to follow faster,
As amorous of their strokes. For her own person,
It beggar'd all description: she did lie
In her pavilion, cloth-of-gold of tissue,
O'er-picturing that Venus where we see
The fancy outwork nature.""",
    """Ay, but to die, and go we know not where;
To lie in cold obstruction and to rot;
This sensible warm motion to become
A kneaded clod; and the delighted spirit
To bathe in fiery floods, or to reside
In thrilling region of thick-ribbed ice;
To be imprison'd in the viewless winds,
And blown with restless violence round about
The pendent world. The weariest and most loathed worldly life
That age, ache, penury and imprisonment
Can lay on nature is a paradise
To what we fear of death.""",
    """Double, double toil and trouble;
Fire burn, and cauldron bubble.
Fillet of a fenny snake,
In the cauldron boil and bake;
Eye of newt and toe of frog,
Wool of bat and tongue of dog,
Adder's fork and blind-worm's sting,
Lizard's leg and owlet's wing,
For a charm of powerful trouble,
Like a hell-broth boil and bubble.""",
    """But I, that am not shaped for sportive tricks,
Nor made to court an amorous looking-glass;
I, that am rudely stamp'd, and want love's majesty
To strut before a wanton ambling nymph;
I, that am curtail'd of this fair proportion,
Cheated of feature by dissembling nature,
Deformed, unfinish'd, sent before my time
Into this breathing world, scarce half made up,
And that so lamely and unfashionable
That dogs bark at me as I halt by them;
Why, I, in this weak piping time of peace,
Have no delight to pass away the time,
Unless to spy my shadow in the sun
And descant on mine own deformity.""",
    """She never told her love,
But let concealment, like a worm i' the bud,
Feed on her damask cheek: she pined in thought,
And with a green and yellow melancholy
She sat like patience on a monument,
Smiling at grief. Was not this love indeed?
We men may say more, swear more: but indeed
Our shows are more than will; for still we prove
Much in our vows, but little in our love.""",
    """The raven himself is hoarse
That croaks the fatal entrance of Duncan
Under my battlements. Come, you spirits
That tend on mortal thoughts, unsex me here,
And fill me from the crown to the toe top-full
Of direst cruelty! make thick my blood;
Stop up the access and passage to remorse,
That no compunctious visitings of nature
Shake my fell purpose, nor keep peace between
The effect and it!""",
    """Now, my co-mates and brothers in exile,
Hath not old custom made this life more sweet
Than that of painted pomp? Are not these woods
More free from peril than the envious court?
Here feel we but the penalty of Adam,
The seasons' difference, as the icy fang
And churlish chiding of the winter's wind,
Which, when it bites and blows upon my body,
Even till I shrink with cold, I smile and say
This is no flattery: these are counsellors
That feelingly persuade me what I am.
Sweet are the uses of adversity,
Which, like the toad, ugly and venomous,
Wears yet a precious jewel in his head;
And this our life exempt from public haunt
Finds tongues in trees, books in the running brooks,
Sermons in stones and good in every thing.""",
    """All furnish'd, all in arms;
All plumed like estridges that with the wind
Baited like eagles having lately bathed;
Glittering in golden coats, like images;
As full of spirit as the month of May,
And gorgeous as the sun at midsummer;
Wanton as youthful goats, wild as young bulls.
I saw young Harry, with his beaver on,
His cuisses on his thighs, gallantly arm'd
Rise from the ground like feather'd Mercury,
And vaulted with such ease into his seat,
As if an angel dropp'd down from the clouds,
To turn and wind a fiery Pegasus
And witch the world with noble horsemanship.""",
    """Farewell! a long farewell, to all my greatness!
This is the state of man: to-day he puts forth
The tender leaves of hopes; to-morrow blossoms,
And bears his blushing honours thick upon him;
The third day comes a frost, a killing frost,
And, when he thinks, good easy man, full surely
His greatness is a-ripening, nips his root,
And then he falls, as I do. I have ventured,
Like little wanton boys that swim on bladders,
This many summers in a sea of glory,
But far beyond my depth: my high-blown pride
At length broke under me and now has left me,
Weary and old with service, to the mercy
Of a rude stream, that must for ever hide me.""",
    """I have of late, but wherefore I know not, lost all my
mirth, forgone all custom of exercises; and indeed it goes so
heavily with my disposition that this goodly frame, the
earth, seems to me a sterile promontory, this most excellent
canopy, the air, look you, this brave o'erhanging firmament,
this majestical roof fretted with golden fire, why, it
appears no other thing to me than a foul and pestilent
congregation of vapours.""",
    """To-morrow is Saint Valentine's day,
All in the morning betime,
And I a maid at your window,
To be your Valentine.
Then up he rose, and donn'd his clothes,
And dupp'd the chamber-door;
Let in the maid, that out a maid
Never departed more.""",
    """Under the greenwood tree
Who loves to lie with me,
And turn his merry note
Unto the sweet bird's throat,
Come hither, come hither, come hither:
Here shall he see
No enemy
But winter and rough weather.
Who doth ambition shun
And loves to live i' the sun,
Seeking the food he eats
And pleased with what he gets.""",
    """Blow, blow, thou winter wind,
Thou art not so unkind
As man's ingratitude;
Thy tooth is not so keen,
Because thou art not seen,
Although thy breath be rude.
Heigh-ho! sing, heigh-ho! unto the green holly:
Most friendship is feigning, most loving mere folly:
Then, heigh-ho, the holly!
This life is most jolly.
Freeze, freeze, thou bitter sky,
That dost not bite so nigh
As benefits forgot:
Though thou the waters warp,
Thy sting is not so sharp
As friend remember'd not.""",
    """O mistress mine, where are you roaming?
O, stay and hear; your true love's coming,
That can sing both high and low:
Trip no further, pretty sweeting;
Journeys end in lovers meeting,
Every wise man's son doth know.
What is love? 'tis not hereafter;
Present mirth hath present laughter;
What's to come is still unsure:
In delay there lies no plenty;
Then come kiss me, sweet and twenty,
Youth's a stuff will not endure.""",
    """When icicles hang by the wall
And Dick the shepherd blows his nail
And Tom bears logs into the hall
And milk comes frozen home in pail,
When blood is nipp'd and ways be foul,
Then nightly sings the staring owl,
Tu-whit; Tu-who, a merry note,
While greasy Joan doth keel the pot.""",
    """Fear no more the heat o' the sun,
Nor the furious winter's rages;
Thou thy worldly task hast done,
Home art gone, and ta'en thy wages:
Golden lads and girls all must,
As chimney-sweepers, come to dust.
Fear no more the frown o' the great;
Thou art past the tyrant's stroke;
Care no more to clothe and eat;
To thee the reed is as the oak:
The sceptre, learning, physic, must
All follow this, and come to dust.""",
]


def build_corpus(min_chars: int = 1_000_000) -> tuple[str, dict]:
    base = "\n\n".join(list(_FALLBACK_PASSAGES) + _EXTRA_PASSAGES)
    # ASCII-normalize defensively (the tokenizer handles any charset, but
    # keeping the char vocab close to the base corpus aids comparability).
    base = base.replace("’", "'").replace("‘", "'")
    base = base.replace("“", '"').replace("”", '"')
    base = base.replace("—", "--").replace("–", "-")
    assert base == base.encode("ascii", "replace").decode(), "non-ascii slipped in"
    reps = max(1, -(-min_chars // len(base)))
    corpus = "\n\n".join([base] * reps)
    stats = {
        "unique_chars": len(base),
        "total_chars": len(corpus),
        "n_passages": len(_FALLBACK_PASSAGES) + len(_EXTRA_PASSAGES),
        "charset": len(set(base)),
        "compressed_unique": len(zlib.compress(base.encode(), 9)),
    }
    return corpus, stats


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="runs/tiny_shakespeare_10x.txt")
    ap.add_argument("--min_chars", type=int, default=1_000_000)
    args = ap.parse_args()
    corpus, stats = build_corpus(args.min_chars)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(corpus)
    # Base-corpus comparison for the journal post.
    base_unique = "\n\n".join(_FALLBACK_PASSAGES)
    stats["base_unique_chars"] = len(base_unique)
    stats["unique_ratio"] = round(stats["unique_chars"] / len(base_unique), 2)
    stats["base_compressed_unique"] = len(zlib.compress(base_unique.encode(), 9))
    stats["compressed_ratio"] = round(
        stats["compressed_unique"] / stats["base_compressed_unique"], 2
    )
    print({"out": str(out), **stats})


if __name__ == "__main__":
    main()
